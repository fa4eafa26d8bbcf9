"""Stub of ``bidexhands.utils.process_marl``."""


def get_AgentIndex(config):
    return [[0], [1]]

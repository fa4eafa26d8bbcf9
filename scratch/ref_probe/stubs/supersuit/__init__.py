"""Minimal supersuit stand-in for the reference MPE path (homogeneous
simple_spread: pad_observations / pad_action_space are identity)."""

def pad_observations_v0(env):
    return env

def pad_action_space_v0(env):
    return env

"""Stub of the upstream ``smac`` package (oxwhirl/smac) for adapter tests."""

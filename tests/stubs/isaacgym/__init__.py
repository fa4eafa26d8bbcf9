"""Stub of NVIDIA ``isaacgym`` (import-order sentinel only) for adapter tests."""

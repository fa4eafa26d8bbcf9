"""Stub of the ``bidexhands`` package (DexterousHands) for adapter tests."""

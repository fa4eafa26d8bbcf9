"""Stub of the upstream ``smacv2`` package for adapter tests."""

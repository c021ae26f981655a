"""Deterministic synthetic sources (FIXTURES.md) and pruned readers."""

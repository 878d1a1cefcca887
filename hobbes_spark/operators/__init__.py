"""Operator implementations backing the fluent Pipeline methods."""

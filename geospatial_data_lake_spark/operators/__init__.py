"""Operator modules — each registers declared queries into the registry."""

"""Stub — populated incrementally."""

QUERIES = {}
ORACLES = {}

"""Placeholder — filled in this round."""

QUERIES: dict = {}
ORACLES: dict = {}

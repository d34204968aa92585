"""Placeholder — filled in this round."""
QUERIES = {}

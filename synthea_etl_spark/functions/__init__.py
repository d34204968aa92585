"""Reusable column-expression helpers."""

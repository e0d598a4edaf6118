"""Scalar function layer (SURVEY.md §2.7)."""

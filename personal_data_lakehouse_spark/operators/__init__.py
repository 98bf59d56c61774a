"""Relational operator library (SURVEY.md §2)."""

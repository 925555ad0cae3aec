"""Relational operators and derived-edge builders (SURVEY.md §2)."""

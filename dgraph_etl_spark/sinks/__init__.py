"""Sink adapters (SURVEY.md §2 A17-A20, B4)."""

"""Structured Streaming implementations (SURVEY.md §2 B35-B40)."""

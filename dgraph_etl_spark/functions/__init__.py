"""Tier C operator library: text analysis, similarity search,
deduplication, multimodal plumbing (SURVEY.md §2 Tier C)."""

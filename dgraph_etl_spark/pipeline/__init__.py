"""Tier A dataflow semantics of the reference pipelines as pure
DataFrame -> DataFrame library functions (SURVEY.md §2 Tier A)."""

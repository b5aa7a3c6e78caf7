"""Source adapters beyond parquet (SURVEY.md §2 B2-B3)."""

"""Tier C suite: LLM-data-pipeline extensions (SURVEY.md §2 Tier C).
Filled incrementally; see functions/ for the implementations."""

from __future__ import annotations

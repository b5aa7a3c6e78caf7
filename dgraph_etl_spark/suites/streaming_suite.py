"""Streaming suite (SURVEY.md B35-B40): Structured Streaming jobs run
synchronously over the events fixture. Filled incrementally; see
streaming/ for the implementations."""

from __future__ import annotations

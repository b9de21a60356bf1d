"""Placeholder — filled in by milestone batches (SURVEY.md §7.3)."""

"""Spark DataFrame operators of the engine (SURVEY.md §2 inventory)."""

"""Operator inventory (SURVEY.md §2) re-expressed as declarative Spark plans."""

"""Relational / flagship / LLM operators (SURVEY.md §2.2–§2.6, §2.9)."""

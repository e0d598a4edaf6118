"""Structured-streaming operators (SURVEY.md §2.9 x_stream_*)."""

"""Sources: REST Python DataSource, JDBC/JSON config (SURVEY.md §2.1)."""

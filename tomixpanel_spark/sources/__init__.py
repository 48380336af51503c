"""Sources: staged-file readers and API fetch wrappers (SURVEY.md §2.1)."""

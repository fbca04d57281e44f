"""Sources (SURVEY.md §2.1): explicit-schema readers."""

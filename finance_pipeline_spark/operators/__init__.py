"""Oracle-checked operator implementations (SURVEY.md §2 inventory)."""

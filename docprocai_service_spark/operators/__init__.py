"""KG pipeline stages and generic analytics operators (SURVEY.md §2)."""

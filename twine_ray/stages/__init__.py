"""Pipeline stages (SURVEY.md §2) — each a Dataset -> Dataset transform."""

"""Read-only pipeline state: rulebase, alias dictionary, checkpoints
(SURVEY.md §2.3)."""

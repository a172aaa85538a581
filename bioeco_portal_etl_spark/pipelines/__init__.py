"""End-to-end dataflows composing the operator library (SURVEY.md §3)."""

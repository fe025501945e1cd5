"""Driver-side pipeline plans — the Spark re-architecture of the
reference's Lambda/Step-Functions pipeline (SURVEY.md §3)."""

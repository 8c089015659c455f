"""ML surface: per-class RF primitives, assemblage, accuracy (SURVEY.md §2.9)."""

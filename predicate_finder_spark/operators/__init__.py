"""Pipeline operators (SURVEY.md §2): extraction, mention generation,
entity linking, candidate predicates, scoring, dedup, ANN, evaluation."""

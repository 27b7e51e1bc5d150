"""Distributed operators (SURVEY.md §2): scoring UDFs, rules, taxonomy,
metrics, dedup, similarity — the engine's replacement for the reference's
model heads and eval utilities."""

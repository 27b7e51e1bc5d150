"""Assembled logical plans (SURVEY.md §3.4): the flagship quality-filter
pipeline and its resume-aware job runner."""

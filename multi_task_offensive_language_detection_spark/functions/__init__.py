"""Scalar function library (SURVEY.md §2.8) — native Column expressions
first (Catalyst/WholeStageCodegen), vectorized numpy kernels second."""

"""Spark-side operators: each module composes DataFrame primitives
(plus vectorized pandas UDF kernels where Spark lacks the op) into
the reference's operator semantics (SURVEY.md §2)."""

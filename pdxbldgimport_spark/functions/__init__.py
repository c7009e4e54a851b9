"""Scalar function surface (SURVEY.md §2.7): data-driven CASE maps,
street normalization, tag projection/merge — each definable once and
rendered both as a Spark Column expression and as oracle SQL."""

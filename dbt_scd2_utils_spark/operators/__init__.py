"""Relational + SCD + data-pipeline operators (DataFrame → DataFrame)."""

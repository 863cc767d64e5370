"""Scalar / window / list helper functions (planner- and executor-side)."""

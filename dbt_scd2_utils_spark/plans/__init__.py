"""Planner: configuration resolution, validation, build orchestration."""

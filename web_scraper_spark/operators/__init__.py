"""Relational building blocks — SURVEY.md §2's joins/windows/set-ops as
reusable DataFrame transforms."""

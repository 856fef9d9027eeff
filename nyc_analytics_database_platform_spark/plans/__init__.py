"""Composite query plans (SURVEY.md section 2.11) - the end-user API surface."""

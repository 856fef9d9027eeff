"""Composable DataFrame operators (SURVEY.md section 2 inventory)."""

"""Sources and sinks (SURVEY.md section 2.1)."""

"""Query operators — each builds a DataFrame plan (no eager execution)."""

"""Engine operators: search, stats, dedup, text analysis, relational."""

"""Query plans: the registered query surface + DuckDB oracle SQL."""

"""Query surface: analytics plans, reference-parity dataflow queries, and
the registry that pairs every query with its DuckDB oracle SQL."""

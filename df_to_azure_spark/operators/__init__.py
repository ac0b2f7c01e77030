"""Dataflow operators: write-mode semantics, lake and SQL sinks."""

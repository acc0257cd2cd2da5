"""Utilities: profiling/benchmark harness and structured logging
(SURVEY.md §5 "Tracing / profiling" and "Metrics / logging")."""

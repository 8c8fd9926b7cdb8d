"""Cross-cutting utilities: logging, profiling, visualization."""

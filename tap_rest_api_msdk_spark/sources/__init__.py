"""WAL sources: deterministic synthesis + batch/stream readers."""

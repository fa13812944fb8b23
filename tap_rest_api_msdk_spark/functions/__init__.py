"""Column-level functions: flatten kernel, schema inference, text/similarity."""

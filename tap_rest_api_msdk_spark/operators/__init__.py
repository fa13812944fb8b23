"""Relational / dedup / incremental operators."""

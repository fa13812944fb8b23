"""Offset planning — the Spark analog of the reference's pagination layer."""

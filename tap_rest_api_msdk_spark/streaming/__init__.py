"""Streaming pipeline: lake table sink, bookmarks, metrics, wiring."""

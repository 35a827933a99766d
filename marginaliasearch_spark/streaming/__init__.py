"""Structured Streaming components — the live-crawl analogue."""

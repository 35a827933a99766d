"""Crawler dataflow operators: admission control (blocklist, link filters),
frontier maintenance (dedup anti-joins, caps, schema correction), politeness
scheduling, recrawl/revisit logic — plus the training-data-pipeline operators
(dedup families, similarity search, text stats) over document tables.
"""

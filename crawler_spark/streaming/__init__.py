"""Micro-batch crawl loop (Structured-Streaming-style foreachBatch over
snapshot tables), checkpoint/resume, and bench hooks."""

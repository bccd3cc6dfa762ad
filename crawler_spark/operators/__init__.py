"""Spark-side crawl operators (SURVEY.md §2 re-expressed as DataFrame
stages): frontier pop, URL-seen set (exact + sketch-accelerated),
politeness tokens, robots enforcement, batched fetch, normalize/classify,
corpus MERGE."""

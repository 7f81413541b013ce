"""LLM-data-pipeline queries: dedup / similarity / text analysis
(filled in as llmdata operators land)."""

from __future__ import annotations

QUERIES: dict = {}

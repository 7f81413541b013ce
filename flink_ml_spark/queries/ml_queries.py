"""Learner / stats / evaluation queries (filled in as SURVEY §2.5-2.9
stages land)."""

from __future__ import annotations

QUERIES: dict = {}

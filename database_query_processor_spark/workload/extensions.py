"""LLM-data-pipeline extension workload (dedup, similarity, text,
multimodal) — filled in incrementally; see operators/dedup.py,
operators/similarity.py, functions/text.py."""

from __future__ import annotations

SPECS: list = []

"""Streaming + temporal-join workload — filled in incrementally; see
streaming/windows.py and operators/temporal.py."""

from __future__ import annotations

SPECS: list = []

"""Shared power-of-two bucketing (bounds jit specialisations)."""

from __future__ import annotations


def next_pow2(n: int, base: int = 1) -> int:
    """Smallest power of two >= max(n, base) starting from ``base``
    (itself a power of two). Used for proposal buckets
    (pipeline/runner.py), sentence buckets (runner + cli data-parallel)."""
    bucket = base
    while bucket < n:
        bucket *= 2
    return bucket

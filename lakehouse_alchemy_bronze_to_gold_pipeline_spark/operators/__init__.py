"""Relational / dataflow operators (SURVEY section 2 inventory)."""

from .flatten import flatten
from .dedup import dedup_exact, dedup_keep_latest, dedup_stream
from .quality import QualityRule, QualityEngine

__all__ = [
    "flatten",
    "dedup_exact",
    "dedup_keep_latest",
    "dedup_stream",
    "QualityRule",
    "QualityEngine",
]

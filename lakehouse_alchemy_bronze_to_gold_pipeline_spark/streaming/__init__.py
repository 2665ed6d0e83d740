"""Structured-Streaming medallion orchestration."""

from .pipeline import EntityConfig, MedallionPipeline

__all__ = ["EntityConfig", "MedallionPipeline"]

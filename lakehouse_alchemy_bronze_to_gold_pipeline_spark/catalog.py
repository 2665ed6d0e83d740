"""Warehouse / namespace management.

The reference runs Unity-Catalog DDL — ``CREATE CATALOG / SCHEMA /
VOLUME IF NOT EXISTS`` (``bronze_ingestion.py:26-28``,
``silver_transformation.py:71-72``, ``gold_transformation.py:34-35``) —
which is Databricks-only.  This module replaces it with a portable
two-level namespace: Spark databases (``CREATE DATABASE IF NOT
EXISTS``) plus plain filesystem directories for what Unity calls
"volumes" (raw landing zones, checkpoints).

A ``Lakehouse`` instance owns one warehouse root and hands out
consistent table identifiers / checkpoint paths to every layer, so
bronze/silver/gold/quality code never concatenates paths by hand.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

#: The reference's layer names (medallion architecture).
LAYERS = ("bronze", "silver", "gold", "quality")


@dataclass
class Lakehouse:
    """Portable replacement for the reference's catalog+schema+volume trio.

    ``pyspark_dwh.bronze.customers`` (reference) becomes database
    ``{prefix}_bronze`` table ``customers`` here, with data under
    ``{root}/tables/...`` and checkpoints under ``{root}/checkpoints``.
    """

    spark: SparkSession
    root: str
    prefix: str = "lakehouse"
    created: set[str] = field(default_factory=set)

    def database(self, layer: str) -> str:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
        db = f"{self.prefix}_{layer}"
        if db not in self.created:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
            self.created.add(db)
        return db

    def table(self, layer: str, entity: str) -> str:
        """Fully qualified table identifier for a layer/entity."""
        return f"{self.database(layer)}.{entity}"

    def checkpoint(self, layer: str, entity: str) -> str:
        """Per-(layer, entity) checkpoint dir — the reference keys its
        checkpoints the same way (``bronze_ingestion.py:82``)."""
        path = os.path.join(self.root, "checkpoints", layer, entity)
        os.makedirs(path, exist_ok=True)
        return path

    def volume(self, name: str) -> str:
        """Raw landing dir (replaces ``CREATE VOLUME``)."""
        path = os.path.join(self.root, "volumes", name)
        os.makedirs(path, exist_ok=True)
        return path

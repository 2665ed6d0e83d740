"""Recursive schema flattener (SURVEY P2-P3, F10).

The reference's most distinctive operator
(``silver_transformation.py:31-52``): walk ``df.schema.fields`` at plan
time; for every ``StructType`` field project its children as
``parent_child`` columns; for every ``ArrayType(StructType)`` field
``explode`` it; loop to fixpoint.  All work happens at *plan
construction* — the emitted plan is pure ``select``/``explode``/
``drop`` nodes, fully codegen'd by Tungsten; no Python row work.

Two semantic landmines in the original are preserved **only** in
parity mode (SURVEY 4.3):

- L3 cross-product grain: exploding *all* arrays in one record
  multiplies grain (orders with 2 items x 2 metadata entries -> 4
  rows).  ``explode_targets`` restricts which arrays explode.
- L4 inner-explode row drop: ``explode`` silently drops records whose
  array is null/empty.  ``outer=True`` switches to ``explode_outer``.

At 100 TB the flattener is a *width* hazard, not a shuffle hazard
(narrow transformations only — no exchange is ever introduced): deeply
nested payloads can blow up column counts, so ``max_depth`` caps
recursion and leaves deeper structs intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten(
    df: DataFrame,
    sep: str = "_",
    outer: bool = False,
    explode_arrays: bool = True,
    explode_targets: set[str] | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """Flatten nested structs/arrays-of-struct to a flat relation.

    Parity mode (defaults): identical semantics to the reference —
    every struct is expanded with ``{parent}{sep}{child}`` naming,
    every array-of-struct is inner-exploded, repeat until flat.

    ``explode_targets``: when given, only arrays whose (flattened) name
    is in the set are exploded; other arrays pass through as-is —
    the L3 fix (pick the grain, e.g. ``{"items"}`` but not
    ``{"metadata"}``).

    ``outer=True``: ``explode_outer`` preserves rows with null/empty
    arrays — the L4 fix.
    """
    explode_fn = F.explode_outer if outer else F.explode
    for _ in range(max_depth):
        struct_fields = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        array_fields = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, ArrayType)
            and isinstance(f.dataType.elementType, StructType)
            and explode_arrays
            and (explode_targets is None or f.name in explode_targets)
        ]
        if not struct_fields and not array_fields:
            return df

        # Expand all structs of this level in ONE select (single
        # projection node), preserving field order like the reference.
        if struct_fields:
            cols = []
            for f in df.schema.fields:
                if f.name in struct_fields:
                    for child in f.dataType.fields:  # type: ignore[union-attr]
                        cols.append(
                            F.col(f"`{f.name}`.`{child.name}`").alias(
                                f"{f.name}{sep}{child.name}"
                            )
                        )
                else:
                    cols.append(F.col(f"`{f.name}`"))
            df = df.select(*cols)

        # Explode arrays one at a time (Spark allows a single generator
        # per select); the loop re-checks the schema each pass.
        for name in array_fields:
            if name not in df.columns:  # renamed by struct expansion above
                continue
            df = df.withColumn(name, explode_fn(F.col(f"`{name}`")))
    raise ValueError(f"flatten did not reach fixpoint within {max_depth} passes")

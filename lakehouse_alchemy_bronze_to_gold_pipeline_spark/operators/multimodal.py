"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` payloads with a typed
metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual media *decode* is STUBBED (this container has no image/audio
libraries): ``decode_stub`` derives deterministic fake features from
the bytes so the pipeline is end-to-end testable, and raises
``NotImplementedError`` when a real decode is requested.

Scale notes: binary payloads dominate row size, so feature extraction
uses ``mapInPandas`` (Arrow batches, column-pruned input) and callers
should repartition to keep batches << executor memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds rows per
batch; payload bytes per batch are what actually matter).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_features — fixed, engine-level contract.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, modality string, "
    "f0 double, f1 double, f2 double, f3 double"
)


def attach_binary_payload(
    df: DataFrame, id_col: str, source_col: str, modality: str = "text"
) -> DataFrame:
    """Opaque binary column + typed metadata struct.

    In production the payload comes off object storage; here it is
    derived from a source column (utf-8 bytes) so tests are
    self-contained."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit(modality).alias("modality"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes, modality: str) -> list[float]:
    """Deterministic fake 'decode' -> 4 features from raw bytes.

    Replace with a real decoder (PIL / torchaudio / ffmpeg) when the
    runtime has one."""
    if modality not in ("text",):
        raise NotImplementedError(
            f"real {modality!r} decode needs media libraries not present "
            "in this environment"
        )
    head = payload[:16].ljust(16, b"\0")
    return [
        len(payload) / 1024.0,
        head[0] / 255.0,
        head[7] / 255.0,
        sum(head) / (16 * 255.0),
    ]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m)
                for p, m in zip(
                    pdf["payload"], [m["modality"] for m in pdf["media_meta"]]
                )
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "f0": [f[0] for f in feats],
                    "f1": [f[1] for f in feats],
                    "f2": [f[2] for f in feats],
                    "f3": [f[3] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)

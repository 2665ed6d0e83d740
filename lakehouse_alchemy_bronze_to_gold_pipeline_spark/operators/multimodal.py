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


#: output schema of resize_payloads
RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, n_bytes_in bigint, n_bytes_out bigint, "
    "modality string"
)


def resize_payloads(
    df: DataFrame, target_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """'Resize' stage: maps each binary payload to a fixed-size
    representation.  For real images this is where PIL/opencv would
    decode-resize-reencode; the container has no media libs, so the
    transform is a deterministic truncate/pad — the Spark-side
    contract (binary in, binary out, Arrow batches, metadata carried)
    is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = [
                bytes(p[:target_bytes]).ljust(target_bytes, b"\0")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payloads,
                    "n_bytes_in": [len(p) for p in pdf["payload"]],
                    "n_bytes_out": [len(p) for p in out_payloads],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


#: output schema of sample_frames — one row per sampled frame
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling stage (video-shaped): explode each payload into
    every ``stride``-th fixed-size chunk — one output row per frame.
    A real decoder would seek keyframes; the chunking stub keeps the
    1->N row expansion, schema, and batch shape real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                n_frames = max(len(p) // frame_bytes, 0)
                for k in range(0, n_frames, stride):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(
                        bytes(p[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


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

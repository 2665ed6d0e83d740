"""Sources & sinks: batch/streaming JSON ingestion and table I/O."""

from .deltalog import DeltaLogTable
from .json_source import infer_json_schema, read_json_batch, read_json_stream
from .tables import TableIO

__all__ = [
    "DeltaLogTable",
    "infer_json_schema",
    "read_json_batch",
    "read_json_stream",
    "TableIO",
]

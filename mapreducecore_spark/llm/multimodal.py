"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched `mapInPandas` so each
task streams record batches instead of materializing the partition.
The actual codecs (PIL/librosa/av) are NOT in this container, so the
decode seam raises NotImplementedError and the deterministic fake path
is what tests and the oracle exercise — the Spark-side plumbing
(schema, batch shape, partitioning) is real either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = "doc_id BIGINT, n_bytes BIGINT, fake_feature BIGINT, first_byte BIGINT"


def decode_image(payload: bytes) -> dict:
    """Real image decode — requires PIL, absent here by design."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a decoder: derives features purely
    from the byte payload."""
    return {
        "n_bytes": len(payload),
        "fake_feature": len(payload) % 256,
        "first_byte": payload[0] if payload else -1,
    }


def decode_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas decode pass over (doc_id, payload binary) rows.

    Arrow moves the binary column in record batches; each batch is
    decoded vectorized-ish in Python. Batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, so memory per task is
    independent of partition size — the property that matters at 100 TB.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "fake_feature": n_bytes % 256,
                    "first_byte": pdf["payload"].map(lambda b: b[0] if b else -1),
                }
            )

    return blobs.mapInPandas(run, schema=DECODE_SCHEMA)

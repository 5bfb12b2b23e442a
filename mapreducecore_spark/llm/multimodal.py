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


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY, n_frame_bytes INT"

_FRAME_BYTES = 256  # fake codec: fixed-size byte slices stand in for frames


def sample_frames(blobs: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for video payloads: one input row fans out to one
    row per sampled frame (mapInPandas may yield MORE rows than it
    consumed — the explode-shaped UDF contract). The fake codec slices
    the payload into fixed 256-byte frames and keeps every k-th; a real
    implementation swaps the slicer for av/ffmpeg keyframe extraction,
    the Spark plumbing (schema, fan-out, Arrow batching) is unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload) // _FRAME_BYTES)
                for i in range(0, n, every_k):
                    chunk = payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "n_frame_bytes": pd.Series(
                        [len(f) for f in frames], dtype="int32"
                    ),
                }
            )

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<FLOAT>"


def extract_feature_vectors(blobs: DataFrame) -> DataFrame:
    """Fixed-width feature vector per payload (the embed step of an
    image/audio pipeline). Fake featurizer = 4 byte-statistics; the
    output column is ARRAY<FLOAT> so it composes directly with the
    similarity operators (llm/similarity.py) downstream."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                a = np.frombuffer(payload, dtype=np.uint8)
                if a.size == 0:
                    feats.append([0.0, 0.0, 0.0, 0.0])
                else:
                    feats.append(
                        [
                            float(a.size),
                            float(a.mean()),
                            float(a.max()),
                            float(a[0]),
                        ]
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)

"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for a 100 TB multimodal corpus: media lives as an opaque
`binary` column (or object-store pointer) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas
functions over `mapInPandas`, so Python touches columnar batches, never
rows. Heavy media work is partition-parallel and never collects.

The codec step (`decode_image` / `resize_image`) is import-guarded: it uses
PIL when the environment provides it and raises a clearly marked
NotImplementedError otherwise (this container has no codec libraries). A
deterministic fake feature extractor keeps the Spark-side plumbing — schema,
batch shape, partitioning — real and testable either way. Here the payload
is the utf-8 encoding of `documents.text`, standing in for image bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..data import load_table

try:  # codec boundary: PIL is optional — kernels degrade to explicit stubs
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - env-dependent
    _PILImage = None

N_FEATURE_BINS = 8


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata columns."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def decode_image(payload_bytes: bytes) -> object:
    """Decode an image payload. Uses PIL when the environment provides it;
    otherwise raises the documented codec-boundary stub error. The Spark-side
    plumbing (schema/batching) is real either way — only this body is
    environment-dependent."""
    if _PILImage is None:
        raise NotImplementedError("image decode requires a codec library (e.g. PIL)")
    import io

    return _PILImage.open(io.BytesIO(payload_bytes))


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """mapInPandas over the binary column: per-batch metadata extraction.
    (The shape every real decode kernel follows: Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame], schema declared up front.)"""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL-safe: encode(NULL)->NULL payload must yield NULL n_bytes
            # (the oracle's strlen(NULL)), not a TypeError
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="Int64",
                    ),
                }
            )

    return df.mapInPandas(meta, schema=_META_SCHEMA)


_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(IntegerType())),
    ]
)


def extract_fake_features(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor (byte-value histogram, 8 bins) —
    the stand-in for an image-embedding kernel; same mapInPandas shape."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    # NULL payload -> NULL feature vector (oracle: any list
                    # expression over strlen(NULL) is NULL)
                    out.append(None)
                    continue
                hist = [0] * N_FEATURE_BINS
                for byte in payload:
                    hist[byte % N_FEATURE_BINS] += 1
                out.append(hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": out})

    return df.mapInPandas(feats, schema=_FEAT_SCHEMA)


def resize_image(payload_bytes: bytes, width: int, height: int) -> bytes:
    """Resize an image payload (bytes in, bytes out — the contract a
    mapInPandas kernel shaped like `extract_binary_meta` applies per batch).
    Uses PIL when available; otherwise raises the documented stub error."""
    if _PILImage is None:
        raise NotImplementedError("image resize requires a codec library (e.g. PIL)")
    import io

    img = _PILImage.open(io.BytesIO(payload_bytes))
    out = io.BytesIO()
    img.resize((width, height)).save(out, format=img.format or "PNG")
    return out.getvalue()


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(df: DataFrame, stride: int = 4, frame_size: int = 32) -> DataFrame:
    """Frame sampling over an opaque video payload — deterministic fake
    decoder: the payload is treated as a concatenation of fixed-size
    "frames"; every `stride`-th frame is emitted as (doc_id, frame_idx,
    frame_bytes). One input row fans out to many output rows — the
    mapInPandas shape for any 1->N media kernel (a real decoder swaps the
    byte-slicing for codec calls; partitioning, batching, and schema stay)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload -> no frames (oracle: unnest over a NULL
                    # range emits zero rows), not a TypeError
                    continue
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    chunk = payload[fi * frame_size : (fi + 1) * frame_size]
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return df.mapInPandas(frames, schema=_FRAME_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over the fake video payloads; oracle replays
    the arithmetic (frame boundaries/strides) on the text length."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs.select("doc_id", "payload")).orderBy("doc_id", "frame_idx")


MM_FRAME_SAMPLE_SQL = """
WITH f AS (
  SELECT doc_id, strlen(text) AS n,
         unnest(range(0, CAST(ceil(strlen(text) / 32.0) AS BIGINT), 4)) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(LEAST(32, n - frame_idx * 32) AS BIGINT) AS frame_bytes
FROM f
ORDER BY doc_id, frame_idx
"""


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata via the Pandas path, joined with the JVM-side
    digest — proves the multimodal plumbing end-to-end and is oracle-checked
    against byte-length/sha256 of the source text."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    meta = extract_binary_meta(docs.select("doc_id", "payload"))
    digests = docs.select("doc_id", "payload_sha256")
    return meta.join(digests, "doc_id").select(
        "doc_id", "n_bytes", "payload_sha256"
    ).orderBy("doc_id")


MM_BINARY_META_SQL = """
SELECT doc_id, strlen(text)::BIGINT AS n_bytes, sha256(text) AS payload_sha256
FROM documents ORDER BY doc_id
"""


def mm_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake feature extraction over binary payloads. Oracle-checked: the
    corpus is ASCII, so the byte histogram equals a codepoint histogram the
    DuckDB oracle can replay. The GATED projection serializes the feature
    vector to JSON text — the gate's row canonicalizer cannot sort array
    cells (the same harness limit that hit geo's coordinates in r1); the
    array contract itself stays on extract_fake_features and its pytest."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_fake_features(docs.select("doc_id", "payload"))
    return feats.select(
        "doc_id", F.to_json(F.col("features")).alias("features_json")
    ).orderBy("doc_id")


def _fake_features_sql() -> str:
    bins = " || ',' || ".join(
        "CAST(len(list_filter(range(1, strlen(text)+1), "
        f"__i -> (unicode(substr(text, __i, 1)) % {N_FEATURE_BINS}) = {b})) AS VARCHAR)"
        for b in range(N_FEATURE_BINS)
    )
    return (
        f"SELECT doc_id, '[' || {bins} || ']' AS features_json "
        "FROM documents ORDER BY doc_id"
    )


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_fake_features": mm_fake_features,
    "mm_frame_sample": mm_frame_sample,
}

ORACLE = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_fake_features": _fake_features_sql(),
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
}

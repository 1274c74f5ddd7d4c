"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` so payload bytes cross the JVM↔Python
boundary once per batch.

The actual codec step is STUBBED in this environment (no image/audio
libraries in the container): :func:`decode_stub` raises
``NotImplementedError`` unless ``fake=True``, in which case it emits a
deterministic fake "decoded" feature vector derived from the bytes.
The Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and tested; swapping in a real decoder is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
])


def attach_payload(df: DataFrame, text_col: str = "text",
                   media_type: str = "image") -> DataFrame:
    """Synthesize an opaque binary payload column (+ metadata struct)
    from a text column — stands in for real image/audio bytes so the
    plumbing is exercised end-to-end with deterministic content."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_stub(data: bytes, fake: bool = True) -> list[float]:
    """STUB decoder. With ``fake=True`` returns a deterministic 8-dim
    feature vector from the byte content (so tests/benchmarks have
    stable values); otherwise raises — plug a real codec here."""
    if not fake:
        raise NotImplementedError(
            "no image/audio codecs in this container; pass fake=True "
            "or swap in a real decoder")
    digest = hashlib.sha1(data).digest()
    return [digest[i] / 255.0 for i in range(8)]


def phash_stub(payload_col: str | F.Column, bits: int = 60) -> F.Column:
    """Perceptual-hash STAND-IN for image near-dup: a deterministic
    ``bits``-wide (≤60 — fits a signed BIGINT in every engine)
    fingerprint of the payload bytes, as a pure Catalyst expression
    (md5-prefix → long). A REAL pHash (DCT of a decoded, resized
    grayscale image) needs the codec this container lacks — swap this
    expression for a decoder UDF at deployment; everything downstream
    (:func:`goose_parser_spark.ops.dedup.hamming_pairs` blocking,
    clustering, keep-policy) is hash-source-agnostic. md5 (not
    xxhash64) so the DuckDB oracle reproduces the exact fingerprints.

    Note: unlike a real perceptual hash, the stub is NOT stable under
    perceptual-identity transforms (resize/recompress) — only under
    byte identity. The driver query plants few-bit variants to
    exercise the Hamming pipeline the way real pHashes would behave.
    """
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    if not 0 < bits <= 60:
        raise ValueError("bits must be in 1..60 (signed-long safe)")
    nhex = (bits + 3) // 4
    return F.conv(F.substring(F.md5(c), 1, nhex), 16, 10).cast("long")


FEATURES_FIELD = StructField("features", ArrayType(FloatType()), True)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    batch_feature_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Output: ``id_col, n_bytes, features: array<float>``. The UDF sees
    whole Arrow batches; per-batch it vectorizes what it can and loops
    only over the opaque byte blobs (unavoidable for codecs).
    """
    from goose_parser_spark.deploy import ship_package
    ship_package(df.sparkSession)

    out_schema = StructType([
        df.schema[id_col],
        StructField("n_bytes", LongType(), False),
        FEATURES_FIELD,
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                id_col: pdf[id_col].reset_index(drop=True),
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0)
                                   .astype("int64"),
                "features": payloads.map(
                    lambda b: decode_stub(bytes(b)) if b is not None else None),
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)

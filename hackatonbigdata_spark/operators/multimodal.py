"""M7 — multimodal column handling (SURVEY.md §7.2 M7; BASELINE.json).

Image/audio/video are opaque ``binary`` payloads with typed metadata; the
engine's job is the Spark-side plumbing — schema, partitioning, Arrow batch
shape, frame addressing — not the codec.  The container has no image/audio
libraries, so the actual decode is STUBBED behind ``NotImplementedError``
with a deterministic fake (documented below); everything around it is real
and tested.

The testdata has no binary table, so the payload is derived
deterministically from ``documents.text`` (UTF-8 bytes) — byte-exact in both
engines, which keeps the metadata/frame queries oracle-checkable.

Scale notes: payloads at 100 TB stay in parquet binary columns; metadata
extraction is a narrow map (no shuffle), frame explosion multiplies rows by
frames-per-asset (bounded by the sample stride), and the decode kernel runs
``mapInPandas`` so each Arrow batch amortizes Python crossing costs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.registry import register

FRAME_BYTES = 256  # fixed-size "frame" granule for the addressing scheme
FRAME_STRIDE = 2  # sample every 2nd frame


@register(
    "multimodal_binary_metadata",
    oracle="""
SELECT doc_id,
       source AS container,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS content_sha256,
       lower(substr(md5(text), 1, 8)) AS magic,
       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames
FROM documents
""",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload: byte length, content
    digest, leading-bytes "magic" tag, and frame count at a fixed 256-byte
    granule.  A narrow projection — no shuffle, fully pushdown-friendly."""
    t = Catalog(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return t.documents.select(
        "doc_id",
        F.col("source").alias("container"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        F.lower(F.substring(F.md5(F.col("text")), 1, 8)).alias("magic"),
        F.ceil(F.octet_length(payload) / F.lit(256.0)).cast("long").alias("n_frames"),
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH m AS (
  SELECT doc_id, text,
         CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
  FROM documents)
SELECT doc_id, u.i AS frame_idx,
       md5(substr(text, CAST(u.i * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
         AS frame_md5,
       CAST(length(substr(text, CAST(u.i * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}))
         AS BIGINT) AS frame_chars
FROM m, unnest(range(0, n_frames)) AS u(i)
WHERE u.i % {FRAME_STRIDE} = 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: address fixed-size granules of the payload, keep
    every ``FRAME_STRIDE``-th frame, and emit a per-frame checksum.  The
    explode multiplies rows by frames-per-asset — bounded and predictable,
    which is what makes it plannable at scale.  (Frames are char-addressed
    here because the corpus is ASCII; byte addressing is identical.)"""
    t = Catalog(spark, sf_dir)
    m = t.documents.select(
        "doc_id",
        "text",
        F.ceil(F.octet_length(F.encode(F.col("text"), "UTF-8")) / F.lit(float(FRAME_BYTES)))
        .cast("long")
        .alias("n_frames"),
    )
    frame = F.expr(f"substring(text, cast(frame_idx * {FRAME_BYTES} + 1 as int), {FRAME_BYTES})")
    return (
        m.select(
            "doc_id",
            "text",
            F.explode(F.expr("sequence(0, n_frames - 1)")).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % FRAME_STRIDE == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.md5(frame).alias("frame_md5"),
            F.length(frame).cast("long").alias("frame_chars"),
        )
    )


def decode_image(payload: bytes) -> dict:
    """REAL decode entry point — requires an image library that is not in
    this container.  The pipeline calls :func:`fake_decode` instead; swap
    this in when Pillow/ffmpeg are available."""
    raise NotImplementedError(
        "image/audio decoding requires Pillow/ffmpeg, not present in this "
        "environment; the pipeline uses the deterministic fake_decode stub"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives plausible media metadata purely
    from the payload bytes so tests are reproducible."""
    n = len(payload)
    return {
        "width": 320 + (n % 5) * 160,
        "height": 240 + (n % 4) * 120,
        "n_channels": 3,
        "est_frames": max(1, n // FRAME_BYTES),
    }


@register("multimodal_decode_stub")
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode kernel over ``mapInPandas``: the real Spark-side
    plumbing (schema, batch iteration, one Python crossing per Arrow batch)
    around the stubbed codec.  Rows-only check — the fake metadata has no
    SQL oracle by design."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode(t.encode("utf-8")) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "byte_len": [len(t.encode("utf-8")) for t in pdf["text"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_channels": [m["n_channels"] for m in metas],
                    "est_frames": [m["est_frames"] for m in metas],
                }
            )

    t = Catalog(spark, sf_dir)
    return t.documents.select("doc_id", "text").mapInPandas(
        kernel,
        schema=(
            "doc_id long, byte_len long, width long, height long,"
            " n_channels long, est_frames long"
        ),
    )

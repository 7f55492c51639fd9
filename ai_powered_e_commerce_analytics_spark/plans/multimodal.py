"""Registry queries for the multimodal operators (beyond-reference).

The testdata has no binary media table, so assets are derived
DETERMINISTICALLY from ``documents`` (content = UTF-8 bytes of ``text``,
metadata from ``doc_id``/``n_chars``) — both engines rebuild the same
asset table independently, keeping the DuckDB oracle honest.

What's oracle-checked: everything deterministic about the media plumbing
— row fan-out of frame sampling, byte accounting through the Arrow
exchange, metadata-only rollups. The fake feature vectors themselves
(sha256-derived, operators/multimodal.py) are unit-tested instead; a SQL
re-derivation of sha256 bytes would test DuckDB's hash, not our plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, media_metadata_stats, sample_frames
from .spec import QuerySpec, t

FRAME_EVERY_MS = 1000

_MEDIA_CASE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media-asset table (schema of operators.multimodal):
    opaque binary content + typed metadata. Metadata-only projections
    never touch ``content`` (Parquet column pruning on the text column)."""
    d = t(spark, sf_dir, "documents")
    media = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("content"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the real mapInPandas operator; the
    oracle checks the deterministic byte accounting per asset."""
    feats = extract_features(_assets(spark, sf_dir), decode="fake")
    return feats.select("asset_id", "media_type", "n_bytes")


MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id AS asset_id,
       {_MEDIA_CASE_SQL} AS media_type,
       octet_length(encode(coalesce(text, ''))) AS n_bytes
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 asset row → N frame rows, duration-driven).
    Oracle reproduces the fan-out arithmetic with generate_series."""
    frames = sample_frames(
        _assets(spark, sf_dir), every_ms=FRAME_EVERY_MS, decode="fake"
    )
    return frames.select("asset_id", "frame_idx", "frame_ms")


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH base AS (
    SELECT doc_id AS asset_id,
           (coalesce(n_chars, 0) * 10 + {FRAME_EVERY_MS - 1})
               // {FRAME_EVERY_MS} AS n_frames
    FROM documents),
fr AS (SELECT asset_id, unnest(range(0, n_frames)) AS gs FROM base)
SELECT asset_id, gs::INT AS frame_idx,
       (gs * {FRAME_EVERY_MS})::BIGINT AS frame_ms
FROM fr
"""


def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata_stats(_assets(spark, sf_dir))


MULTIMODAL_METADATA_STATS_SQL = f"""
SELECT {_MEDIA_CASE_SQL} AS media_type,
       count(*) AS n_assets,
       avg((doc_id % 640 + 1) * (doc_id % 480 + 1)) AS avg_pixels,
       (sum(n_chars * 10))::BIGINT AS total_duration_ms
FROM documents
GROUP BY 1
"""


def multimodal_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup on the BINARY content column: md5 the bytes,
    point every asset at its hash group's canonical (min asset_id), and
    flag duplicates — the asset-store dedup that runs before any decode
    (identical uploads collapse regardless of filename/metadata).

    Plan: md5 is a per-row map over the binary column; one
    content-hash-keyed window (high-cardinality key) picks canonicals.
    Oracle parity: the derived assets' bytes ARE the text's UTF-8, so
    DuckDB's ``md5(text)`` reproduces Spark's ``md5(content BINARY)``
    byte-for-byte.
    """
    from pyspark.sql.window import Window

    assets = _assets(spark, sf_dir)
    hashed = assets.select(
        "asset_id",
        "media_type",
        F.md5("content").alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    return hashed.select(
        "asset_id",
        "media_type",
        "content_hash",
        F.min("asset_id").over(w).alias("canonical_asset_id"),
        (F.col("asset_id") != F.min("asset_id").over(w)).alias("is_dup"),
    )


MULTIMODAL_DEDUP_CONTENT_SQL = f"""
WITH hashed AS (
    SELECT doc_id AS asset_id, {_MEDIA_CASE_SQL} AS media_type,
           md5(coalesce(text, '')) AS content_hash
    FROM documents
)
SELECT asset_id, media_type, content_hash,
       min(asset_id) OVER (PARTITION BY content_hash)
           AS canonical_asset_id,
       asset_id <> min(asset_id) OVER (PARTITION BY content_hash)
           AS is_dup
FROM hashed
"""


MULTIMODAL_SPECS = [
    QuerySpec(
        "multimodal_dedup_content_hash", multimodal_dedup_content_hash,
        MULTIMODAL_DEDUP_CONTENT_SQL, ("media-content-dedup",),
    ),
    QuerySpec(
        "multimodal_features", multimodal_features,
        MULTIMODAL_FEATURES_SQL, ("media-feature-extract",),
    ),
    QuerySpec(
        "multimodal_frame_sample", multimodal_frame_sample,
        MULTIMODAL_FRAME_SAMPLE_SQL, ("media-frame-sample",),
    ),
    QuerySpec(
        "multimodal_metadata_stats", multimodal_metadata_stats,
        MULTIMODAL_METADATA_STATS_SQL, ("media-metadata",),
    ),
]

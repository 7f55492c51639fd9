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

"""Bloom pre-shuffle pruning: no false negatives, bounded fpp, and a
probe plan that never shuffles or re-scans the pruned side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_prune,
)


def test_no_false_negatives_and_join_equality(spark):
    # string keys — the regime where bits beat broadcasting raw keys
    build = spark.createDataFrame(
        [(f"key_{i:05d}",) for i in range(0, 3000, 3)], "k string"
    )
    probe = spark.createDataFrame(
        [(f"key_{i:05d}", i) for i in range(4000)], "k string, v int"
    )
    pruned = bloom_semi_prune(probe, "k", build, "k")
    assert pruned.columns == probe.columns
    true_semi = {
        r["k"] for r in probe.join(build, "k", "left_semi").collect()
    }
    kept = {r["k"] for r in pruned.collect()}
    assert true_semi <= kept  # NO false negatives — ever
    # the downstream inner join is provably unchanged
    a = sorted(
        (r["k"], r["v"]) for r in probe.join(build, "k").collect()
    )
    b = sorted(
        (r["k"], r["v"]) for r in pruned.join(build, "k").collect()
    )
    assert a == b


def test_false_positive_rate_near_sizing(spark):
    build = spark.createDataFrame(
        [(f"in_{i}",) for i in range(2000)], "k string"
    )
    # probe keys fully disjoint from the build side
    probe = spark.createDataFrame(
        [(f"out_{i}",) for i in range(10000)], "k string"
    )
    pruned = bloom_semi_prune(
        probe, "k", build, "k", fpp=0.01, expected_items=2000
    )
    fp = pruned.count() / 10000
    assert fp < 0.05, fp  # ~1% nominal; generous margin for hash luck


def test_null_probe_keys_dropped_empty_build_prunes_all(spark):
    build = spark.createDataFrame([(1,)], "k long").where("k < 0")
    probe = spark.createDataFrame(
        [(None,), (1,), (2,)], "k long"
    )
    assert bloom_semi_prune(
        probe, "k", build, "k", expected_items=1
    ).count() == 0
    # null keys never survive even when their garbage positions hit
    some = spark.createDataFrame([(1,), (2,)], "k long")
    kept = bloom_semi_prune(probe, "k", some, "k").collect()
    assert all(r["k"] is not None for r in kept)


def test_probe_plan_no_shuffle_single_broadcast(spark):
    build = spark.createDataFrame(
        [(i,) for i in range(5000)], "k long"
    )
    probe = spark.createDataFrame(
        [(i, i * 2) for i in range(20000)], "k long, v long"
    )
    bits, params = bloom_build(build, "k", expected_items=5000)
    assert params.k >= 2  # multiple inline probes exercised
    plan = (
        bloom_prune(probe, "k", bits, params)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # probe side: scan -> one single-row broadcast pin -> inline
    # filter; never shuffled, never joined per-probe, never exploded
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastExchange") == 1
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Generate" not in plan  # the build-side explode is upstream


def test_one_filter_prunes_many_probe_scans(spark):
    # the docstring's reuse claim: build ONCE, prune several scans —
    # the thing Spark's single-pass injected runtime filter can't do
    build = spark.createDataFrame(
        [(i,) for i in range(0, 1000, 5)], "k long"
    )
    bits, params = bloom_build(build, "k", expected_items=200)
    probe_a = spark.createDataFrame([(i,) for i in range(500)], "k long")
    probe_b = spark.createDataFrame(
        [(i,) for i in range(500, 1500)], "k long"
    )
    for probe in (probe_a, probe_b):
        kept = {
            r["k"] for r in bloom_prune(probe, "k", bits, params).collect()
        }
        want = {
            r["k"] for r in probe.join(build, "k", "left_semi").collect()
        }
        assert want <= kept


def test_composite_key_no_false_negatives_join_equality(spark):
    # composite (string, long) join key, different column names per
    # side; any-null composite keys are dropped like the 1-col path
    build = spark.createDataFrame(
        [(f"s{i % 11}", i % 17) for i in range(200)], "bk1 string, bk2 long"
    )
    probe = spark.createDataFrame(
        [(f"s{i % 23}", i % 29, i) for i in range(2000)]
        + [(None, 1, -1), ("s1", None, -2)],
        "pk1 string, pk2 long, v int",
    )
    pruned = bloom_semi_prune(
        probe, ["pk1", "pk2"], build, ["bk1", "bk2"]
    )
    cond = (F.col("pk1") == F.col("bk1")) & (F.col("pk2") == F.col("bk2"))
    want = sorted(
        (r["pk1"], r["pk2"], r["v"])
        for r in probe.join(build, cond).select("pk1", "pk2", "v").collect()
    )
    got = sorted(
        (r["pk1"], r["pk2"], r["v"])
        for r in pruned.join(build, cond).select("pk1", "pk2", "v").collect()
    )
    assert want == got
    kept = {
        (r["pk1"], r["pk2"]) for r in pruned.collect()
    }
    matches = {
        (r["bk1"], r["bk2"]) for r in build.collect()
    } & {(r["pk1"], r["pk2"]) for r in probe.collect()}
    assert matches <= kept
    assert all(a is not None and b is not None for a, b in kept)


def test_key_type_and_arity_mismatches_raise(spark):
    # int-vs-long keys hash differently -> would silently prune true
    # matches; both schemas are in hand, so it must raise instead
    build = spark.createDataFrame([(1,)], "k int")
    probe = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="types must match"):
        bloom_semi_prune(probe, "k", build, "k")
    with pytest.raises(ValueError, match="pair positionally"):
        bloom_semi_prune(probe, ["k"], build.withColumn(
            "k2", F.col("k")
        ), ["k", "k2"])


def test_missing_or_ambiguous_key_column_raises_loudly(spark):
    build = spark.createDataFrame([(1,)], "k long")
    probe = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="not found"):
        bloom_semi_prune(probe, "k", build, "kk")  # typo
    dup = build.join(probe.withColumnRenamed("k", "j"), F.lit(True)).select(
        "k", F.col("j").alias("k")
    )  # two columns literally named k
    with pytest.raises(ValueError, match="ambiguous"):
        bloom_semi_prune(probe, "k", dup, "k")


def test_probe_with_reserved_column_name_survives(spark):
    # a probe frame that already owns a __bloom column must neither
    # collide at analysis time nor lose its column
    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame(
        [(i, f"x{i}") for i in range(100)], "k long, __bloom string"
    )
    out = bloom_semi_prune(probe, "k", build, "k")
    assert out.columns == ["k", "__bloom"]
    rows = {r["k"]: r["__bloom"] for r in out.collect()}
    assert set(range(50)) <= set(rows)
    assert rows[7] == "x7"


def test_undersized_filter_still_has_no_false_negatives(spark):
    # a wildly wrong expected_items only degrades fpp (here: the 64-bit
    # floor saturates and everything passes) — NEVER completeness
    build = spark.createDataFrame(
        [(f"k{i}",) for i in range(500)], "k string"
    )
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(1000)], "k string"
    )
    kept = {
        r["k"]
        for r in bloom_semi_prune(
            probe, "k", build, "k", expected_items=1
        ).collect()
    }
    want = {r["k"] for r in probe.join(build, "k", "left_semi").collect()}
    assert want <= kept


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_keys = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), max_size=60
)


@given(build_keys=_keys, probe_keys=_keys)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_no_false_negatives(spark, build_keys, probe_keys):
    # the load-bearing invariant on arbitrary key sets (dups, extremes,
    # empty sides): the pruned set is a superset of the true semi-join
    build = spark.createDataFrame(
        [(k,) for k in build_keys], "k long"
    )
    probe = spark.createDataFrame(
        [(k,) for k in probe_keys], "k long"
    )
    kept = {
        r["k"] for r in bloom_semi_prune(probe, "k", build, "k").collect()
    }
    assert (set(build_keys) & set(probe_keys)) <= kept


def test_bits_frame_is_compact_dense(spark):
    # 1% fpp sizing: ONE row, array length == ceil(m/64)
    build = spark.createDataFrame(
        [(f"wide_composite_key_{i:08d}",) for i in range(4000)],
        "k string",
    )
    bits, params = bloom_build(build, "k", expected_items=4000)
    rows = bits.collect()
    assert len(rows) == 1
    assert len(rows[0]["__bloom"]) == (params.m_bits + 63) // 64


def test_oversized_filter_raises_with_sharding_guidance(spark):
    # 1e9 keys at 1% fpp sizes ~1.2 GB — one array cell, past any sane
    # broadcast. The build must refuse loudly, not emit the artifact.
    build = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="shard"):
        bloom_build(build, "k", fpp=0.01, expected_items=1_000_000_000)
    # and an explicit tiny bound trips on a modest build side too
    with pytest.raises(ValueError, match="max_filter_bytes"):
        bloom_build(
            build, "k", expected_items=100_000, max_filter_bytes=1024
        )


def test_mismatched_bits_params_pairing_raises(spark):
    # pairing bits with params from a DIFFERENT build would send
    # element_at out of range -> NULL keep -> silent false negatives.
    # The build stamps sizing into column metadata; the probe checks.
    build_small = spark.createDataFrame([(i,) for i in range(10)], "k long")
    build_big = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    bits_small, params_small = bloom_build(build_small, "k")
    _, params_big = bloom_build(build_big, "k")
    assert params_big.m_bits > params_small.m_bits
    probe = spark.createDataFrame([(i,) for i in range(10)], "k long")
    with pytest.raises(ValueError, match="mismatch"):
        bloom_prune(probe, "k", bits_small, params_big)
    # the correct pairing still keeps everything (sanity)
    assert bloom_prune(probe, "k", bits_small, params_small).count() == 10


def test_metadata_survives_reserved_column_rename(spark):
    # bloom_prune renames __bloom on collision; withColumnRenamed must
    # carry the sizing metadata so the guard still sees it
    build = spark.createDataFrame([(i,) for i in range(20)], "k long")
    bits, params = bloom_build(build, "k")
    probe = spark.createDataFrame(
        [(i, i) for i in range(20)], "k long, __bloom long"
    )
    _, params_other = bloom_build(
        spark.createDataFrame([(i,) for i in range(9000)], "k long"), "k"
    )
    with pytest.raises(ValueError, match="mismatch"):
        bloom_prune(probe, "k", bits, params_other)
    assert bloom_prune(probe, "k", bits, params).count() == 20


def test_metadata_stripped_bits_fail_loudly_on_size_mismatch(spark):
    # ADVICE r9: with the sizing metadata absent the static pairing
    # guard cannot run; the structural word-count invariant must then
    # be pinned into the plan so a stale/mispaired bits frame raises at
    # execution instead of silently dropping true-match rows.
    build_small = spark.createDataFrame([(i,) for i in range(10)], "k long")
    build_big = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    bits_small, params_small = bloom_build(build_small, "k")
    _, params_big = bloom_build(build_big, "k")
    stripped = bits_small.select(
        F.col("__bloom").alias("__bloom", metadata={})
    )
    assert not (stripped.schema["__bloom"].metadata or {})
    probe = spark.createDataFrame([(i,) for i in range(10)], "k long")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    with pytest.raises(
        (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException),
        match="word",
    ):
        bloom_prune(probe, "k", stripped, params_big).count()
    # correct pairing with stripped metadata still works exactly
    got = sorted(
        r["k"]
        for r in bloom_prune(probe, "k", stripped, params_small).collect()
    )
    assert got == list(range(10))

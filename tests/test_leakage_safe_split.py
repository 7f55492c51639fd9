"""Cluster-integral train/test split (r11).

Oracle parity is covered by the registry battery; here the CONTRACT is
pinned: every near-dup component is atomic under the split (no cluster
straddles train/val/test — the eval-contamination bug the per-doc gate
cannot prevent), and the assignment is independent of the doc-level
split's gate (different salt, so correlated assignment would be a bug).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.plans.sampling import (
    train_test_split_assignment,
    train_test_split_leakage_safe,
)

from conftest import SF_DIR


def test_every_component_is_split_atomic(spark):
    df = train_test_split_leakage_safe(spark, SF_DIR)
    straddlers = (
        df.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # sanity: all three splits are populated and every doc is assigned
    splits = {r["split"] for r in df.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert df.count() == n_docs


def test_cluster_gate_is_salted_independently(spark):
    # the component-level gate must not just replay the doc-level gate:
    # for singleton components (component == doc_id) the two gates hash
    # the same key under DIFFERENT seeds, so equality everywhere would
    # mean the salt is dead
    doc = train_test_split_assignment(spark, SF_DIR).select(
        "doc_id", F.col("gate").alias("doc_gate")
    )
    clu = train_test_split_leakage_safe(spark, SF_DIR).where(
        F.col("component") == F.col("doc_id")
    )
    joined = clu.join(doc, "doc_id")
    n = joined.count()
    same = joined.where(F.col("gate") == F.col("doc_gate")).count()
    assert n > 0 and same < n

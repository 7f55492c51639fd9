"""Persisted IVF-PQ ANN index: build once, serve many.

The oracle-gated ``plans/simsearch.simsearch_ivfpq_topk`` retrains the
codebook inside the query so DuckDB can replay it; a DEPLOYMENT does
that exactly once and serves every search from stored artifacts. This
module materializes that path:

- ``build_ivfpq_index`` writes three artifacts under ``out_dir``:
  the coarse IVF centroids (tiny parquet), the trained PQ codebook
  (M x K rows), and the per-vector CODES — (vec_id, ivf_cid, m,
  pq_cid), i.e. 4 small ints per vector instead of 64 doubles, the
  ~32x memory contraction that makes a 100 TB corpus's index fit a
  cluster — written BUCKETED by ``ivf_cid``
  (sources/bucketing.write_bucketed), so a search scans only its
  nprobe buckets off storage.
- ``ivfpq_search`` probes the centroids, computes the per-query ADC
  lookup table from the STORED codebook, prunes the codes scan to the
  probed buckets (``SelectedBucketsCount`` in the plan — the bucketing
  module's autoBucketedScan gotcha is handled here), and runs the SAME
  ADC assembly as the oracle-gated query (``plans/simsearch.adc_topk``
  and ``adc_lut_rows`` are shared code), so the served math IS the
  oracle-checked math — parity asserted in tests/test_ann_index.py.

Scale: build pays one training fixed point + one bucketed shuffle of
the 4-int code rows; each search touches nprobe buckets of int codes,
a query-sized probe table, and a Q x M x K-row LUT broadcast. Nothing
at serve time is corpus-sized except the pruned code scan.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.simsearch import (
    IVF_NPROBE,
    KNN_K,
    _emb,
    _ivf_centroids,
    _pq_argmin,
    _pq_state,
    adc_lut_rows,
    adc_topk,
    ivf_assignment,
)
from ..functions.core import pin
from ..sources.bucketing import write_bucketed

_MANIFEST = "_index.json"
_AUTO_BUCKET_CONF = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
# The autoBucketedScan toggle in ivfpq_search is a SESSION-global conf:
# two concurrent searches on a shared SparkSession could interleave
# set/restore and either lose bucket pruning mid-window or leak the
# disabled state (ADVICE r11). Serialize the toggle window; planning a
# search is milliseconds, so contention is negligible. Callers needing
# truly parallel searches should isolate via spark.newSession() per
# thread (session-local confs, shared executors).
_CONF_TOGGLE_LOCK = threading.Lock()


def build_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    table: str,
    buckets: int = 8,
) -> dict:
    """Train + materialize the IVF-PQ index under ``out_dir``; the code
    rows register as bucketed catalog table ``table`` (external path,
    so the files live with the other artifacts). Returns the manifest
    (also written to ``_index.json``)."""
    sub, cents = _pq_state(spark, sf_dir)
    codes = sub.select(
        "vec_id", "m", _pq_argmin(cents)["cid"].alias("pq_cid")
    )
    assign = ivf_assignment(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("ivf_cid")
    )
    write_bucketed(
        codes.join(assign, "vec_id"),
        table,
        "ivf_cid",
        buckets=buckets,
        path=f"{out_dir}/codes",
    )
    _ivf_centroids(_emb(spark, sf_dir)).write.mode("overwrite").parquet(
        f"{out_dir}/centroids"
    )
    cb_rows = [
        (m, cid, vec)
        for m, cent_list in sorted(cents.items())
        for cid, vec in cent_list
    ]
    spark.createDataFrame(
        cb_rows, "m int, cid long, cemb array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/codebook")
    manifest = {"table": table, "buckets": buckets, "nprobe": IVF_NPROBE}
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def _load_codebook(spark: SparkSession, out_dir: str):
    cb: dict[int, list[tuple[int, list[float]]]] = {}
    for r in spark.read.parquet(f"{out_dir}/codebook").collect():
        cb.setdefault(int(r["m"]), []).append(
            (int(r["cid"]), list(r["cemb"]))
        )
    return {m: sorted(v) for m, v in cb.items()}


def encode_vectors(
    spark: SparkSession, out_dir: str, vecs: DataFrame
) -> DataFrame:
    """Encode NEW vectors — (vec_id, emb array<double>) — against the
    index's FROZEN artifacts: nearest coarse centroid by the same
    rounded-cosine + lowest-cid rule the builder used, PQ codes by the
    same per-subspace argmin, centroids inlined as literals (pure map,
    no join on the vector side). This is how an index stays fresh
    without retraining: the codebook is a trained artifact; new data is
    quantized under it (and codebook drift is monitored separately —
    ``embedding_pq_codebook``'s reconstruction error over fresh data
    rising is the retrain signal)."""
    from ..plans.simsearch import PQ_SUBDIM, _sqdist

    cents = _load_codebook(spark, out_dir)
    coarse = [
        (int(r["cid"]), list(r["c_emb"]), float(r["c_norm"]))
        for r in spark.read.parquet(f"{out_dir}/centroids").collect()
    ]
    norm = F.sqrt(
        F.aggregate(
            F.zip_with("emb", "emb", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    structs = []
    for cid, c_emb, c_norm in sorted(coarse):
        lit = F.array(*[F.lit(v) for v in c_emb])
        cos = F.round(
            F.aggregate(
                F.zip_with("emb", lit, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("__norm") * F.lit(c_norm)),
            6,
        )
        structs.append(
            F.struct(
                (-cos).alias("neg_cos"), F.lit(cid).cast("long").alias("cid")
            )
        )
    ivf_cid = F.least(*structs)["cid"]

    sub_structs = []
    for m in sorted(cents):
        off = m * PQ_SUBDIM
        sub = F.slice("emb", off + 1, PQ_SUBDIM)
        best = F.least(*[
            F.struct(
                _sqdist(sub, F.array(*[F.lit(v) for v in vec])).alias("d"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, vec in cents[m]
        ])
        sub_structs.append(
            F.struct(
                F.lit(m).cast("int").alias("m"), best["cid"].alias("pq_cid")
            )
        )
    return (
        vecs.withColumn("__norm", norm)
        .select(
            "vec_id",
            F.explode(F.array(*sub_structs)).alias("mc"),
            ivf_cid.alias("ivf_cid"),
        )
        .select(
            "vec_id",
            F.col("mc.m").alias("m"),
            F.col("mc.pq_cid").alias("pq_cid"),
            "ivf_cid",
        )
    )


def append_to_index(
    spark: SparkSession, out_dir: str, vecs: DataFrame
) -> int:
    """Incremental index maintenance: encode ``vecs`` under the frozen
    artifacts and APPEND their code rows into the bucketed codes table
    (``insertInto`` respects the table's bucket spec, so the new rows
    land in the right buckets and searches stay pruned). Append-only
    contract: callers pass NEW vec_ids (re-encoding an existing id
    duplicates it — dedup upstream). Each append adds one file per
    touched bucket; a long-lived index periodically rewrites the table
    (the same economics as the sketch stores' compaction). Returns the
    number of code rows appended."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    rows = encode_vectors(spark, out_dir, vecs).select(
        # insertInto is POSITIONAL: match the table's column order
        "vec_id", "m", "pq_cid", "ivf_cid"
    )
    n = rows.count()
    rows.write.insertInto(manifest["table"], overwrite=False)
    return n


def ivfpq_search(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    *,
    k: int = KNN_K,
    exclude_self: bool = True,
) -> DataFrame:
    """Serve top-k ADC neighbors for ``queries`` — a DataFrame with
    (query_id, q_emb) and optionally q_norm — from the persisted index.
    Request-sized driver work only: the query vectors and the M x K
    codebook are collected to build the LUT; the code scan is pruned to
    the probed buckets.

    Concurrency: the bucket-pruning conf toggle below is session-global,
    so concurrent calls on ONE SparkSession serialize on a module lock
    (the locked window is plan construction + the eager materialization,
    not the caller's consumption). For genuinely parallel serving use
    ``spark.newSession()`` per search thread."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    cent = spark.read.parquet(f"{out_dir}/centroids")
    q = queries
    if "q_norm" not in q.columns:
        q = q.withColumn(
            "q_norm",
            F.sqrt(
                F.aggregate(
                    F.zip_with("q_emb", "q_emb", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ),
        )
    q_cos = F.round(
        F.aggregate(
            F.zip_with("q_emb", "c_emb", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("p_cos"), "cid")
    probe = (
        q.join(F.broadcast(cent))
        .select("query_id", "cid", q_cos.alias("p_cos"))
        .withColumn("prn", F.row_number().over(pw))
        .where(F.col("prn") <= manifest["nprobe"])
        .select("query_id", F.col("cid").alias("ivf_cid"))
    )
    cents = _load_codebook(spark, out_dir)
    q_rows = [
        (int(r["query_id"]), list(r["q_emb"]))
        for r in q.select("query_id", "q_emb").collect()
    ]
    lut = spark.createDataFrame(
        adc_lut_rows(q_rows, cents),
        "query_id long, m int, pq_cid long, lut_micro long",
    )
    probed_cids = sorted(
        {int(r["ivf_cid"]) for r in probe.select("ivf_cid").collect()}
    )
    # Bucket pruning needs a LITERAL filter on the bucket key AND the
    # autoBucketedScan heuristic disabled for filter-only probes (the
    # bucketing module's measured gotcha) — the plan then reads
    # "SelectedBucketsCount: n of m" instead of scanning every bucket.
    with _CONF_TOGGLE_LOCK:
        prev = spark.conf.get(_AUTO_BUCKET_CONF, "true")
        spark.conf.set(_AUTO_BUCKET_CONF, "false")
        try:
            code_rows = (
                spark.table(manifest["table"])
                .where(F.col("ivf_cid").isin(probed_cids))
            )
            cand = code_rows.select("vec_id", "ivf_cid").distinct().join(
                F.broadcast(probe), "ivf_cid"
            )
            if exclude_self:
                cand = cand.where(F.col("vec_id") != F.col("query_id"))
            out = adc_topk(
                code_rows.select("vec_id", "m", "pq_cid"),
                cand.select("query_id", "vec_id"),
                lut,
                k=k,
            )
            # materialize within the conf window so the pruned scan is
            # the executed scan even if the caller collects later
            out = pin(out, eager=True)
        finally:
            spark.conf.set(_AUTO_BUCKET_CONF, prev)
    return out

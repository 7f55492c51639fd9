"""Persisted MinHash-LSH band-key index over everything the corpus has
ever accepted — the FULL-HISTORY axis of ingest-time near-dedup
(VERDICT r14 next-round #4).

The streaming ingest job (streaming/jobs.documents_ingest_stream) drops
near-duplicates against LSH band-key STATE, which a watermark bounds: a
near-duplicate arriving after its original's state expired sails into
the corpus. A real multi-snapshot pipeline dedups every increment
against ALL history. This module persists the band keys of accepted
documents so that check is a key lookup, never a corpus recompute:

- **Key grain**: ``(band, band_sig)`` — byte-identical to the batch LSH
  (plans/textops.dedup_minhash_lsh) and the streaming dedup
  (near_dedup_stream), all three via plans/textops.doc_band_keys'
  shared shingle→minhash→band machinery. The oracle-gated contract for
  the match semantics is plans/textops.dedup_against_corpus_index.
- **Layout**: parquet partitioned by ``kb`` — a hash bucket of the band
  key (``pmod(hash(band, band_sig), n_key_buckets)``). Probes join on
  ``kb`` too, with the (small) incoming batch broadcast, so Spark's
  dynamic partition pruning skips every bucket the batch does not
  touch: per-batch cost is O(new-batch × matching buckets) of index
  scanned, not O(history). At 100 TB the index is a few TB of narrow
  key rows; a 4096-bucket layout makes a 10k-doc batch touch at most
  ~30k buckets' worth of files (usually far fewer).
- **Lifecycle**: generation directories + an atomic JSON manifest (the
  ann_index / sketch-store pattern, via sources/manifest.py). Appends
  land as ``token={t}`` partition subdirectories inside the live
  generation (k=v naming so multi-token loads share ONE consistent
  file index — a single FileScan, which is what lets DPP prune) and are
  IDEMPOTENT per token (mode=overwrite at a token-derived path), so an
  at-least-once ``foreachBatch`` replay rewrites identical content
  instead of double-appending. ``compact_corpus_index`` folds the
  append residue into one fresh distinct generation; an append racing
  a compaction re-reads the manifest after its write and re-appends
  into the advanced generation (the append_to_index loop,
  operators/ann_index.py).

Writer contract: ONE appender at a time per index (the streaming job's
sequential foreachBatch satisfies this) and compaction is single-writer
— same as every other store in the engine. Readers are lock-free: the
manifest swap is atomic, so a concurrent load sees the old generation
XOR the new one.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.manifest import (
    load_json_manifest,
    local_path,
    publish_json_manifest,
)

_MANIFEST = "_corpus_index.json"

#: Default key-bucket count for the partitioned layout. Sized for the
#: local fixtures; a production 100 TB index wants 2048-8192 so single
#: buckets stay file-system friendly (manifest records the value, so
#: probes always agree with the layout they read).
N_KEY_BUCKETS = 64


def key_bucket(band: Column, band_sig: Column, n_key_buckets: int) -> Column:
    """The layout's partition bucket for a band key. hash() is Spark's
    Murmur3 — deterministic across sessions, so a key always probes the
    bucket it was written to."""
    return F.pmod(F.hash(band, band_sig), F.lit(n_key_buckets))


def _gen_dir(out_dir: str, generation: int) -> str:
    return os.path.join(local_path(out_dir), f"gen{generation}")


def _load(out_dir: str) -> dict | None:
    return load_json_manifest(out_dir, _MANIFEST)


def _publish(out_dir: str, manifest: dict) -> None:
    publish_json_manifest(out_dir, _MANIFEST, manifest)


def corpus_index_manifest(out_dir: str) -> dict:
    """The published manifest (generation, n_key_buckets, tokens,
    tombstoned) — the cheap read maintenance policies key off (e.g.
    the ingest stream's compaction cadence counts ``tokens``)."""
    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    return manifest


def init_corpus_index(
    spark: SparkSession,
    out_dir: str,
    docs: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_key_buckets: int = N_KEY_BUCKETS,
) -> dict:
    """Create an empty index (or seed it with ``docs``' band keys as
    generation 0's base token) and publish its manifest. Idempotence:
    refuses to clobber an existing index."""
    if _load(out_dir) is not None:
        raise ValueError(f"corpus index already exists at {out_dir}")
    os.makedirs(local_path(out_dir), exist_ok=True)
    manifest = {
        "generation": 0,
        "n_key_buckets": int(n_key_buckets),
        "tokens": [],
        "tombstoned": [],
    }
    _publish(out_dir, manifest)
    if docs is not None:
        append_accepted_docs(
            spark, out_dir, docs, "base", id_col=id_col, text_col=text_col
        )
        manifest = _load(out_dir)
    return manifest


def load_corpus_index(
    spark: SparkSession, out_dir: str, *, exclude_token: str | None = None
) -> DataFrame | None:
    """The live generation's key rows ``(kb, band, band_sig)`` or None
    while the index is empty. ``exclude_token`` drops one append's
    directory from the read — the replay shield: a re-run micro-batch
    must not see its own previously-appended keys, or it would drop
    every one of its documents as self-duplicates."""
    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    gen = _gen_dir(out_dir, manifest["generation"])
    paths = [
        os.path.join(gen, f"token={tok}")
        for tok in manifest["tokens"]
        if tok != exclude_token
    ]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return None
    return spark.read.option("basePath", gen).parquet(*paths).select(
        "kb", "band", "band_sig"
    )


def append_corpus_keys(
    spark: SparkSession, out_dir: str, keys: DataFrame, token: str
) -> int:
    """Append band-key rows ``(band, band_sig)`` under ``token`` and
    record the token in the manifest. Returns the row count written.

    Idempotent per token (overwrite at the token path: a replay
    rewrites identical content). Compaction-safe: after the write the
    manifest is re-read; if the generation advanced, the rows were
    written into a directory the compactor may already have scanned —
    tombstoned and doomed — so they are re-written into the live
    generation, looping until the generation is stable across one
    write (operators/ann_index.append_to_index's loop)."""
    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    if "/" in token or "=" in token or token in ("", ".", ".."):
        raise ValueError(f"bad token {token!r}")
    n_kb = manifest["n_key_buckets"]
    rows = keys.select(
        key_bucket(F.col("band"), F.col("band_sig"), n_kb).alias("kb"),
        F.col("band").cast("int").alias("band"),
        F.col("band_sig").cast("string").alias("band_sig"),
    )
    n = rows.count()
    for _ in range(5):
        gen = manifest["generation"]
        path = os.path.join(_gen_dir(out_dir, gen), f"token={token}")
        rows.write.mode("overwrite").partitionBy("kb").parquet(path)
        after = _load(out_dir)
        if after["generation"] == gen:
            if token not in after["tokens"]:
                after["tokens"] = list(after["tokens"]) + [token]
                _publish(out_dir, after)
            return n
        manifest = after
    raise RuntimeError(
        "append_corpus_keys: index generation kept advancing across 5 "
        "attempts — compaction is not honoring its single-writer "
        "contract"
    )


def append_accepted_docs(
    spark: SparkSession,
    out_dir: str,
    docs: DataFrame,
    token: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Compute ``docs``' band keys and append them under ``token`` —
    the convenience wrapper batch pipelines call after accepting a
    slice of documents into the corpus."""
    from ..plans.textops import doc_band_keys

    keys = doc_band_keys(docs, id_col, text_col).select("band", "band_sig")
    return append_corpus_keys(spark, out_dir, keys, token)


def index_hits(index_keys: DataFrame, probe_keys: DataFrame) -> DataFrame:
    """Distinct probe ids whose band keys hit the index — the scale
    path: the (small) probe side is BROADCAST and carries the layout's
    ``kb`` column in the join keys, so the scan of the partitioned
    index is dynamic-partition-pruned to the buckets the probe
    touches. ``probe_keys`` must already carry (id, kb, band,
    band_sig); the id column is whatever its first column is named."""
    id_col = probe_keys.columns[0]
    return (
        index_keys.join(
            F.broadcast(probe_keys), ["kb", "band", "band_sig"]
        )
        .select(id_col)
        .distinct()
    )


def dedup_against_index(
    spark: SparkSession,
    out_dir: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivors of ``docs`` against the persisted index: every doc
    none of whose band keys appears in the corpus history. The
    production form of the oracle-gated batch twin
    (plans/textops.dedup_against_corpus_index — identical match
    semantics, history recomputed there so DuckDB can replay it).
    Shingle-less docs emit no keys and always survive, mirroring the
    stream's ``short:{id}`` self-key semantics. Does NOT dedup the
    batch against itself — pair it with the windowed stateful dedup
    (stream) or dropDuplicates on the keys (batch) for in-batch dups."""
    from ..plans.textops import doc_band_keys

    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    index_keys = load_corpus_index(spark, out_dir)
    if index_keys is None:
        return docs
    n_kb = manifest["n_key_buckets"]
    probe = doc_band_keys(docs, id_col, text_col).select(
        F.col(id_col),
        key_bucket(F.col("band"), F.col("band_sig"), n_kb).alias("kb"),
        "band",
        "band_sig",
    )
    hits = index_hits(index_keys, probe)
    return docs.join(hits, id_col, "left_anti")


def compact_corpus_index(spark: SparkSession, out_dir: str) -> dict:
    """Fold the live generation's append residue into ONE fresh
    distinct generation (token ``base``) and tombstone the old
    directory. Single-writer per the module contract; readers see old
    XOR new via the manifest swap. Old directories are only DELETED by
    :func:`sweep_corpus_index` — the retention grace that lets
    in-flight readers of the previous generation drain first."""
    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    gen = manifest["generation"]
    live = load_corpus_index(spark, out_dir)
    new_gen = gen + 1
    base = os.path.join(_gen_dir(out_dir, new_gen), "token=base")
    if live is not None:
        live.distinct().write.mode("overwrite").partitionBy("kb").parquet(
            base
        )
        tokens = ["base"]
    else:
        tokens = []
    new_manifest = {
        "generation": new_gen,
        "n_key_buckets": manifest["n_key_buckets"],
        "tokens": tokens,
        "tombstoned": list(manifest["tombstoned"]) + [f"gen{gen}"],
    }
    _publish(out_dir, new_manifest)
    return new_manifest


def sweep_corpus_index(out_dir: str) -> list[str]:
    """Delete tombstoned generation directories (call once readers of
    the pre-compaction generation have drained). Returns the swept
    paths."""
    manifest = _load(out_dir)
    if manifest is None:
        raise ValueError(f"no corpus index at {out_dir} — init first")
    swept = []
    for name in manifest["tombstoned"]:
        p = os.path.join(local_path(out_dir), name)
        if os.path.exists(p):
            shutil.rmtree(p)
        swept.append(p)
    manifest["tombstoned"] = []
    _publish(out_dir, manifest)
    return swept

"""Structured Streaming jobs (SURVEY.md §2.9 ST1-ST4).

The reference is batch-with-polling: the collector accumulates API pulls
and flushes JSON files (ST1), downstream stages poll bucket folders in
created_at order, decrement per-file row budgets as LLM batches complete,
and move consumed files to a processed folder with retry-on-failure
(ST2/ST3 — ~90 lines of bookkeeping across data_transformer.py:77-96,
data_loader.py:38-51, extractor.go:22-60, loader.go:116-154).

On Spark ALL of that bookkeeping is the streaming file source: checkpoint
tracking gives exactly-once file consumption (ST2), restart-safe progress
(ST3), and ``cleanSource=archive`` replaces the manual move. Each job
supports ``trigger(availableNow=True)`` for batch-parity runs (process
everything pending, then stop).

ST4: the reference has no event-time semantics (per-date KPIs are string
keys upserted per run, late rows silently rewrite the date's row). Parity
is the foreachBatch+upsert path; ``events_hourly_stream`` is the
documented extension with real watermarks, and ``sessionize_stream`` the
custom stateful operator (applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterator

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from ..functions.core import pin, unordered_pair_rows
from ..operators.enrich import (
    StubLLMClient,
    assign_item_ids,
    enrich_reviews,
    enrich_sentiments,
)
from ..operators.kpis import all_kpis, gold_join
from ..schemas import BRONZE_PRODUCTS, GOLD_FINAL, SILVER_REVIEWS
from ..sinks import upsert_kpi_tables, write_silver_chunks


def _file_stream(
    spark: SparkSession,
    src_dir: str,
    schema: T.StructType,
    *,
    archive_dir: str | None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """FIFO file-queue source (ST2) with archival commit (ST3).

    ``latestFirst=false`` (default) preserves the reference's
    created_at-ascending consumption order (data_extractor.py:33-37);
    ``cleanSource=archive`` is the exactly-once replacement for the
    manual move-with-retry (data_loader.py:38-51).
    """
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.json")  # drops .emptyFolderPlaceholder
        # Descend into the per-batch subdirs the sinks write
        # (write_bronze_batch / write_silver_chunks / collector_stream).
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.json(src_dir)


def bronze_to_silver_stream(
    spark: SparkSession,
    bronze_new_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    *,
    archive_dir: str | None = None,
    client_factory: Callable[[], object] = StubLLMClient,
    available_now: bool = True,
):
    """The Go review-generation pipeline (survey §3.2) as one streaming
    job: bronze JSON files → item_id assignment → LLM review generation →
    merge → 50k-chunked silver JSON (loader.go:109-113).
    """
    bronze = _file_stream(
        spark, bronze_new_dir, BRONZE_PRODUCTS, archive_dir=archive_dir
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():  # P5 empty-guard (main.py:37-50)
            return
        # Per-micro-batch 1-based ids — the reference's ids are per-run
        # (extractor.go:107-110); one micro-batch == one reference run.
        items = assign_item_ids(batch, order_by=["date", "product_name", "price"])
        reviews = enrich_reviews(items, client_factory)
        silver = items.join(reviews, "item_id")  # J3 (inner, loader.go:30-62)
        # batch_id-keyed dir => crash-replay rewrites, never duplicates.
        write_silver_chunks(silver, silver_dir, batch_id=batch_id)

    writer = bronze.writeStream.option("checkpointLocation", checkpoint_dir)
    writer = writer.foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def silver_to_gold_stream(
    spark: SparkSession,
    silver_dir: str,
    gold_dir: str,
    kpi_dir: str,
    checkpoint_dir: str,
    *,
    archive_dir: str | None = None,
    client_factory: Callable[[], object] = StubLLMClient,
    available_now: bool = True,
):
    """The Python ETL pipeline (survey §3.1) as one streaming job:
    silver files → sentiment LLM → gold left join → 3 KPI upserts + gold
    snapshot. Idempotent keyed MERGE makes replays safe (ST3/ST4 parity:
    late rows rewrite their key's row, exactly like the reference's
    on_conflict upsert)."""
    silver = _file_stream(
        spark, silver_dir, SILVER_REVIEWS, archive_dir=archive_dir
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sentiments = enrich_sentiments(batch, client_factory)
        gold = gold_join(batch, sentiments).cache()
        try:
            upsert_kpi_tables(spark, all_kpis(gold), kpi_dir)
            # overwrite, not append: batch_id makes the dir deterministic,
            # so a crash-replay of the same micro-batch rewrites it
            # idempotently instead of appending a duplicate copy.
            gold.write.mode("overwrite").json(f"{gold_dir}/batch_{batch_id}")
        finally:
            gold.unpersist()

    writer = silver.writeStream.option("checkpointLocation", checkpoint_dir)
    writer = writer.foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    *,
    event_time: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins.

    With ``event_time`` set, ``dropDuplicatesWithinWatermark`` dedups on
    the keys ALONE while the watermark bounds the state — a key is kept
    only until it ages past the watermark, so state is O(keys per
    watermark window), not O(all keys ever). Without it, plain
    ``dropDuplicates`` state grows unboundedly (only for replay-free
    batch-parity runs). The batch twin is the exact-dedup groupBy
    (plans/textops.py dedup_exact); this is the ingestion-time form that
    keeps duplicates out of bronze in the first place.
    """
    if event_time:
        return events.withWatermark(
            event_time, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def near_dedup_stream(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time: str | None = None,
    watermark: str = "2 hours",
    keep_text: bool = False,
    static_index: DataFrame | None = None,
) -> DataFrame:
    """Streaming NEAR-duplicate filter: MinHash band keys as the dedup
    key within the watermark (state-bounded streaming LSH).

    Each document explodes into its ``LSH_BANDS`` (band, band_sig) rows —
    the SAME band signatures as the batch ``dedup_minhash_lsh`` (shared
    math: plans/textops.minhash_band_sig_cols), so stream and batch agree
    on what "near-dup" means. The stateful operator is
    ``dropDuplicatesWithinWatermark`` on ``(band, band_sig)``: state is
    one entry per distinct band key inside the watermark window — O(docs
    × LSH_BANDS per window), NOT O(pairs), and it expires. A later doc
    that shares ANY band with an earlier doc loses that band row here;
    reduce the surviving rows to whole-doc survivors per micro-batch with
    :func:`near_dedup_survivors` inside ``foreachBatch``.

    Semantics note (greedy, like every streaming LSH): a doc whose only
    collision was with an already-dropped doc is still dropped — its
    bands matched state entries owned by the dropped doc. That is the
    keep-first transitive approximation; the batch
    ``dedup_survivors_cc`` query is the exact-closure form for
    compaction-time re-runs.

    ``keep_text=True`` carries the payload on the BAND-0 row only
    (null on the others): a surviving doc by definition kept ALL its
    band rows, so its band-0 row always supplies the text downstream —
    the payload crosses the stateful shuffle once per doc, never
    ``LSH_BANDS`` times.

    ``static_index`` (optional): a ``(band, band_sig)``-bearing frame
    of the corpus's FULL ingest history
    (operators/corpus_index.load_corpus_index) applied as a stateless
    stream-static anti-join BEFORE the stateful dedup — historical
    near-dups are dropped without ever entering (or re-seeding) LSH
    state. Resolved at stream start; see documents_ingest_stream for
    the live-manifest completion of this check.

    SHORT-DOC GUARD: a doc with fewer than ``SHINGLE_K`` words (or
    null/empty text) has an EMPTY shingle-hash array — every minhash
    would be null and all such docs would collapse onto one identical
    band signature, silently dropping every short doc after the first.
    The batch ``_lsh_verified_pairs`` filters ``size(sh) > 0`` before
    banding, so short docs carry no near-dup signal there either and
    always survive. Parity: short rows bypass the LSH keys entirely —
    each rides ONE ``(band=-1, band_sig="short:<id>")`` row keyed by its
    own ``id_col``, which never collides, and unions back with the
    banded rows (exact dedup of short docs belongs upstream in
    :func:`dedup_stream`, same as the batch pipeline). Every row also
    carries ``__n_bands`` (LSH_BANDS for banded docs, 1 for short docs)
    so :func:`near_dedup_survivors` can require the full set back.
    """
    from ..plans.textops import LSH_BANDS, minhash_band_sig_cols, shingle_hashes

    carried = [c for c in docs.columns if c != text_col]
    if id_col not in carried:
        raise ValueError(
            f"id_col {id_col!r} must be a non-payload column of the input "
            f"(got {docs.columns})"
        )
    payload = [F.col(text_col)] if keep_text else []
    # coalesce: size(null_array) is NULL (ANSI) or -1 (legacy) — null-text
    # docs must land in the short branch, not vanish from both.
    n_sh = F.coalesce(F.size("hs"), F.lit(0))
    sig = docs.withColumn("hs", shingle_hashes(text_col))
    banded = sig.where(n_sh > 0).select(
        *carried,
        *payload,
        *minhash_band_sig_cols("hs"),
    )
    if static_index is not None:
        # Full-history pre-filter (VERDICT r14 #4): drop any doc whose
        # band keys hit the persisted corpus index BEFORE the stateful
        # dedup, so known-historical duplicates never enter LSH state.
        # LSH_BANDS stateless stream-static LEFT joins on the per-band
        # key column, then keep only all-miss rows. The static frame is
        # resolved at stream START — within-run arrivals are covered by
        # the watermark state, and the foreachBatch-side check against
        # the LIVE manifest (documents_ingest_stream) closes the
        # past-watermark same-run gap; this layer exists to keep state
        # lean. Index keys are history-side only, so a match is never a
        # self-match.
        for b in range(LSH_BANDS):
            ik = (
                static_index.where(F.col("band") == b)
                .select(F.col("band_sig").alias(f"__isig{b}"))
                .distinct()
            )
            banded = banded.join(
                ik, banded[f"band{b}"] == ik[f"__isig{b}"], "left"
            )
        banded = banded.where(
            " AND ".join(f"__isig{b} IS NULL" for b in range(LSH_BANDS))
        ).drop(*[f"__isig{b}" for b in range(LSH_BANDS)])
    bands = banded.select(
        *carried,
        *payload,
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])
        ).alias("band", "band_sig"),
    ).withColumn("__n_bands", F.lit(LSH_BANDS).cast("long"))
    if keep_text:
        bands = bands.withColumn(
            text_col,
            F.when(F.col("band") == 0, F.col(text_col)),
        )
    short = sig.where(n_sh <= 0).select(
        *carried,
        *payload,
        F.lit(-1).alias("band"),
        F.concat(F.lit("short:"), F.col(id_col).cast("string")).alias(
            "band_sig"
        ),
        F.lit(1).cast("long").alias("__n_bands"),
    )
    all_bands = bands.unionByName(short)
    if event_time:
        return all_bands.withWatermark(
            event_time, watermark
        ).dropDuplicatesWithinWatermark(["band", "band_sig"])
    return all_bands.dropDuplicates(["band", "band_sig"])


def documents_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "2 hours",
    archive_dir: str | None = None,
    available_now: bool = True,
    quality_gate: bool = False,
    corpus_index_dir: str | None = None,
    index_compact_every: int | None = None,
    static_prefilter: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Deployable ingestion job for a document corpus: stream JSON files
    of ``(doc_id, text, ts)`` rows, optionally drop rule-battery
    rejects, drop near-duplicates against LSH band-key state within the
    watermark, and append only the unique survivors (with their text)
    to the corpus parquet.

    ``quality_gate=True`` applies the batch quality-filter battery
    (plans/filtering.with_quality_verdict — the SAME rule expression
    strings the oracle-gated ``quality_filter_battery`` evaluates, so
    stream and batch agree on what "low quality" means) as a stateless
    per-row filter BEFORE the stateful dedup: rejects never enter LSH
    state, shrinking state by the drop rate for free.

    Composition: :func:`near_dedup_stream` with ``keep_text=True`` rides
    the payload on each doc's band-0 row only (once per doc through the
    stateful shuffle, never ×bands); ``foreachBatch`` reduces the
    surviving band rows to whole-doc survivors — text recovered by the
    per-doc ``max`` — and writes them to the corpus.

    The sink is REPLAY-IDEMPOTENT: ``foreachBatch`` is at-least-once, so
    a crash between the corpus write and the checkpoint commit re-runs
    the same micro-batch on restart. Each batch therefore OVERWRITES its
    own ``batch_id={N}`` partition directory (same pattern as
    ``write_silver_chunks``) instead of appending to a flat dir — a
    replay rewrites identical content in place and the corpus never
    gains duplicate rows. Readers ``spark.read.parquet(out_dir)`` as
    usual; partition discovery surfaces ``batch_id`` as a column.

    ``corpus_index_dir`` (VERDICT r14 next-round #4) plugs in the
    persisted band-key index (operators/corpus_index.py) and closes
    the watermark gap — WITHOUT it, dedup is only as old as the
    window, and a near-duplicate arriving after its original's state
    expired enters the corpus. Three hooks, all O(batch):

    1. **Static pre-filter** (in-plan, before the stateful dedup):
       the index as of stream START anti-joins each doc's band keys —
       known-historical dups never enter LSH state. COST NOTE: a
       stream-static join re-evaluates the static side per micro-batch
       and cannot use the broadcast-probe/DPP path (the probe is the
       stream), so this layer re-reads O(index) each batch. It buys
       LEANER STATE, not correctness — the live check below is the
       complete history check on probe economics — so on a very large
       index set ``static_prefilter=False`` and let layer 2 carry it.
    2. **Live check** (foreachBatch): each batch's surviving band rows
       anti-join the index at its CURRENT manifest — catches dups of
       docs accepted by THIS run's earlier batches after their
       watermark state expired (the case the static frame cannot see).
       The batch's own append token is excluded, so an at-least-once
       replay does not drop its own documents as self-duplicates.
    3. **Append**: accepted docs' band keys are appended under token
       ``batch_{id}`` — idempotent per token (overwrite), so replays
       rewrite identical content. Corpus partition first, keys second:
       a crash between the two replays the whole batch and both writes
       are overwrite-idempotent.

    The index must exist (operators/corpus_index.init_corpus_index).
    In-window duplicates are still the stateful operator's job; the
    index only answers "seen anywhere in history".

    ``index_compact_every=N`` bounds append residue on a long-running
    stream: when N token directories have accumulated, the batch first
    folds them into a fresh distinct generation (compaction is safe
    in-stream because foreachBatch serialization makes every prior
    token checkpoint-committed; a replayed batch — own token already
    recorded — skips compaction so the exclude-token replay shield
    keeps working). Tombstoned generations are left for a CLI sweep
    after the stream stops, since the stream-start static frame may
    still read them.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = (
        _file_stream(
            spark,
            src_dir,
            schema,
            archive_dir=archive_dir,
            max_files_per_trigger=max_files_per_trigger,
        )
        .withColumn("ts_utc", F.to_timestamp("ts"))
        .drop("ts")
        # Pipeline observability (Spark-native, no extra pass): per
        # micro-batch row counts surface in every
        # StreamingQueryProgress.observedMetrics — the numbers an
        # ingestion dashboard plots without re-reading the sink.
        .observe("docs_in", F.count(F.lit(1)).alias("n_docs_in"))
    )
    if quality_gate:
        from ..plans.filtering import METRIC_COLS, with_quality_verdict

        stream = (
            with_quality_verdict(stream)
            .where(F.col("keep"))
            .select("doc_id", "text", "ts_utc")
            .observe("docs_kept", F.count(F.lit(1)).alias("n_docs_kept"))
        )
        assert not set(METRIC_COLS) & set(stream.columns)
    static_index = None
    if corpus_index_dir is not None:
        from ..operators.corpus_index import (
            append_corpus_keys,
            compact_corpus_index,
            corpus_index_manifest,
            index_hits,
            key_bucket,
            load_corpus_index,
        )

        if static_prefilter:
            static_index = load_corpus_index(spark, corpus_index_dir)
    deduped = near_dedup_stream(
        stream,
        event_time="ts_utc",
        watermark=watermark,
        keep_text=True,
        static_index=static_index,
    )

    def process(band_batch: DataFrame, batch_id: int) -> None:
        if band_batch.isEmpty():
            return
        survivors = near_dedup_survivors(band_batch)
        if corpus_index_dir is None:
            survivors.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )
            return
        token = f"batch_{batch_id}"
        if index_compact_every:
            manifest = corpus_index_manifest(corpus_index_dir)
            # Cadence compaction keeps the token-directory count (and
            # with it manifest size + file-listing cost) bounded on a
            # long-running stream. Only COMMITTED batches' tokens may
            # fold: foreachBatch runs serially after the previous
            # batch's checkpoint commit, so every recorded token except
            # possibly THIS batch's (a crash replay) is committed.
            # Skip on replay — folding the uncommitted token into the
            # base would defeat the exclude_token replay shield and
            # the replayed batch would drop all its docs as
            # self-duplicates. Tombstoned generations are NOT swept
            # here: the stream-start static frame may still read them
            # (sweep from the CLI once the stream is stopped).
            if (
                token not in manifest["tokens"]
                and len(manifest["tokens"]) >= index_compact_every
            ):
                compact_corpus_index(spark, corpus_index_dir)
        live = load_corpus_index(
            spark, corpus_index_dir, exclude_token=token
        )
        keyed = band_batch.where(F.col("band") >= 0).select(
            "doc_id", "band", "band_sig"
        )
        if live is not None:
            # the operator's probe economics, not a naive join: the
            # batch's keys broadcast with the layout's kb bucket in
            # the join key, so the index scan is DPP-pruned to the
            # buckets this batch touches — O(batch x matching
            # buckets) per micro-batch, never an O(index) shuffle
            n_kb = corpus_index_manifest(corpus_index_dir)[
                "n_key_buckets"
            ]
            probe = keyed.select(
                "doc_id",
                key_bucket(
                    F.col("band"), F.col("band_sig"), n_kb
                ).alias("kb"),
                "band",
                "band_sig",
            )
            survivors = survivors.join(
                index_hits(live, probe), "doc_id", "left_anti"
            )
        # pin: survivors feeds both the corpus write and the key
        # append — one compute, and the hygiene knob applies
        survivors = pin(survivors, eager=True)
        survivors.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )
        accepted_keys = keyed.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        ).select("band", "band_sig")
        append_corpus_keys(spark, corpus_index_dir, accepted_keys, token)

    writer = deduped.writeStream.option("checkpointLocation", checkpoint_dir)
    writer = writer.foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def near_dedup_survivors(band_batch: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Reduce :func:`near_dedup_stream`'s surviving band rows to whole-doc
    survivors (run inside ``foreachBatch``): a doc is unique iff ALL of
    the band rows it emitted survived the stateful band-key dedup — any
    lost band means a band collided with an earlier doc (in this batch or
    in watermark state), i.e. a near-dup. The per-doc expected count
    rides the ``__n_bands`` column (LSH_BANDS for banded docs, 1 for the
    short-doc pass-through rows). All of a doc's band rows travel in the
    same micro-batch (they come from one input row), so the per-batch
    count is complete."""
    extra = [
        c
        for c in band_batch.columns
        if c not in (id_col, "band", "band_sig", "__n_bands")
    ]
    # max() recovers each carried column's single non-null value per doc
    # (payload columns under keep_text ride only the band-0 row).
    return (
        band_batch.groupBy(id_col)
        .agg(
            F.count("*").alias("__kept"),
            F.max("__n_bands").alias("__want"),
            *[F.max(c).alias(c) for c in extra],
        )
        .where(F.col("__kept") == F.col("__want"))
        .drop("__kept", "__want")
    )


def events_hourly_stream(
    events: DataFrame,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """ST4 extension: tumbling 1-hour event-time window with a watermark
    (late-data policy the reference lacks). ``events`` must carry a
    timestamp column ``ts_utc``; batch twin: plans/relational.py
    events_hourly_rollup."""
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_STATE = T.StructType(
    [
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("revenue_cents", T.LongType()),
    ]
)
_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("revenue", T.DoubleType()),
    ]
)

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, matches the batch query


def _session_row(user_id, start, last, n, cents):
    return {
        "user_id": user_id,
        "session_start_us": start,
        "session_end_us": last,
        "n_events": n,
        # integer cents in state; dollars only at emission (float policy)
        "revenue": cents / 100.0,
    }


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: gap-based session windows per user, with
    per-session purchase-revenue attribution folded into the state.

    The deterministic batch twins are plans/relational.py
    events_user_sessions (session boundaries) and events_session_revenue
    (revenue fold — same integer-cents rule: ``round(value*100)`` summed
    over purchase events, emitted as dollars). Inputs may omit
    event_type/value, in which case revenue is 0 (pure sessionization).
    """
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, cents = state.get
        state.remove()
        yield pd.DataFrame([_session_row(user_id, start, last, n, cents)])
        return

    rows = []
    for pdf in pdfs:
        has_rev = "event_type" in pdf.columns and "value" in pdf.columns
        for i in range(len(pdf)):
            if has_rev and pdf["event_type"].iloc[i] == "purchase":
                v = pdf["value"].iloc[i]
                c = 0 if pd.isna(v) else int(round(float(v) * 100))
            else:
                c = 0
            rows.append((int(pdf["ts_us"].iloc[i]), c))
    rows.sort()
    closed = []
    if state.exists:
        start, last, n, cents = state.get
    else:
        start = last = None
        n = cents = 0
    for v, c in rows:
        if last is not None and v - last > SESSION_GAP_US:
            closed.append(_session_row(user_id, start, last, n, cents))
            start, n, cents = v, 0, 0
        if start is None:
            start = v
        last = v
        n += 1
        cents += c
    state.update((start, last, n, cents))
    state.setTimeoutDuration(60 * 60 * 1000)  # close idle sessions after 1h
    if closed:
        yield pd.DataFrame(closed)


def session_window_stream(
    events: DataFrame, *, watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN ``session_window``
    — the Catalyst-native declarative twin of :func:`sessionize_stream`
    (r10). Same output contract (``_SESSION_OUT``): one row per closed
    session with integer-µs bounds taken from the actual first/last
    event (NOT the window's gap-padded end) and purchase revenue folded
    in exact cents, emitted as dollars (float policy).

    Why both twins exist: the ``applyInPandasWithState`` form owns
    arbitrary per-session logic (revenue fold today, any state shape
    tomorrow) at the cost of a Python island and hand-rolled timeout
    handling; this form keeps the whole operator JVM-side — Spark's
    native merging-session state store, watermark-driven eviction, and
    map-side partial merges of session fragments
    (``spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition``)
    — and works identically over a BATCH frame (the parity test runs
    it both ways). Prefer it whenever the per-session fold is
    expressible as aggregates.

    Boundary semantics: the built-in closes a session when the next
    event arrives AT or past ``last + gap`` (half-open window), while
    the stateful twin closes strictly past (``> SESSION_GAP_US``).
    Event times are integer MICROSECONDS, so an exactly-gap-sized
    spacing is a realizable input (cron-like traffic fires it every
    time): on that input this twin closes the session and the stateful
    twin continues it — a documented divergence, not a rounding
    curiosity (ADVICE r10). Pick the twin whose convention matches the
    downstream contract; the batch plan ``events_user_sessions`` uses
    the stateful (strict-greater) convention.

    Input: (user_id, ts[, event_type, value]) with ``ts`` a timestamp
    column; in streaming mode closed sessions emit once the event-time
    watermark (default 1 h, matching the stateful twin's processing-
    time timeout) passes the session end.
    """
    has_rev = "event_type" in events.columns and "value" in events.columns
    rev_c = (
        F.when(
            F.col("event_type") == "purchase",
            F.coalesce(F.round(F.col("value") * 100).cast("long"), F.lit(0)),
        ).otherwise(F.lit(0))
        if has_rev
        else F.lit(0).cast("long")
    )
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("__w")
        )
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count("*").alias("n_events"),
            (F.sum(rev_c) / 100.0).alias("revenue"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
            "revenue",
        )
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessionization (with per-session revenue attribution
    when ``event_type``/``value`` columns are present) over a stream of
    (user_id, ts_us[, event_type, value]) rows —
    ``applyInPandasWithState`` custom stateful operator."""
    cols = [
        c
        for c in ("user_id", "ts_us", "event_type", "value")
        if c in events.columns
    ]
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def hourly_anomaly_stream(
    spark: SparkSession,
    events: DataFrame,
    state_table: str,
    flags_dir: str,
    checkpoint_dir: str,
    *,
    watermark: str = "2 hours",
    window_hours: int = 7,
    z_threshold: float = 2.0,
    available_now: bool = True,
):
    """Streaming rate-anomaly monitor: watermarked hourly event counts
    upsert into a keyed state table, and every micro-batch re-scores
    the CONTRACTED hourly series (O(hours) rows, not O(events)) with
    the same trailing-window z-score rule as the batch
    ``daily_revenue_anomalies`` — the metrics-then-score split that
    keeps the streaming side incremental and the scoring side tiny.

    The state upsert is the manifest sink (replay-idempotent per key:
    a replayed batch rewrites the same hourly counts); the flags
    snapshot is overwritten per batch — it is derived state,
    recomputable from the table at any time.
    """
    from ..sinks import read_upsert_table, upsert_parquet

    hourly = (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "n_events",
        )
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_parquet(spark, batch, state_table, "hour", num_buckets=8)
        series = read_upsert_table(spark, state_table)
        # ONE scoring rule for stream and batch: the shared helper from
        # the batch daily_revenue_anomalies (cannot drift).
        from ..plans.profiling import trailing_zscore

        flags = trailing_zscore(
            series,
            "hour",
            "n_events",
            window=window_hours,
            threshold=z_threshold,
        ).select("hour", "n_events", "z", "is_anomaly")
        flags.write.mode("overwrite").parquet(flags_dir)

    writer = hourly.writeStream.option("checkpointLocation", checkpoint_dir)
    writer = writer.outputMode("update").foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def cdc_apply_stream(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    key: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    seq_col: str = "seq",
    archive_dir: str | None = None,
    available_now: bool = True,
):
    """Streaming CDC consumer: JSON change files (op I/U/D + ``seq_col``)
    stream into :func:`~..sinks.apply_cdc_parquet` per micro-batch —
    the end-to-end "replicate an OLTP table into the lakehouse" job.

    Replay safety (foreachBatch is at-least-once): a replayed
    micro-batch re-applies the SAME collapsed change set — upserts
    rewrite identical rows (last-writer-wins over themselves) and
    deletes of already-absent keys are no-ops — so a crash between the
    CDC commit and the checkpoint commit cannot corrupt the table; it
    costs one extra manifest version. Within a batch, ``seq_col``
    picks each key's latest change (Debezium-style compaction);
    ACROSS batches the file-source FIFO order preserves the feed's
    commit order.
    """
    from ..sinks import apply_cdc_parquet

    stream = _file_stream(spark, src_dir, schema, archive_dir=archive_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_cdc_parquet(spark, batch, table_path, key, seq_col=seq_col)

    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir)
    writer = writer.foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


_DEBOUNCE_STATE = T.StructType([T.StructField("last_ts_us", T.LongType())])
_DEBOUNCE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

DEBOUNCE_WINDOW_US = 4 * 3600 * 1_000_000  # matches the batch twin


def _debounce_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(user, type) debounce state: emit an event iff the previous
    RAW event of the same key is at least DEBOUNCE_WINDOW_US older —
    the stateful twin of the batch ``events_dedup_within_window`` lag
    rule (gap to the previous raw event, not the previous survivor),
    with state = ONE long per key. Same cross-batch arrival contract as
    :func:`_funnel_fn`: within a batch events fold in event-time order;
    a late event landing in a later micro-batch is judged against the
    newest ts already seen (the batch twin would judge it against its
    true predecessor) — re-run the batch query at compaction time for
    the exact-closure form."""
    user_id, event_type = key
    if state.hasTimedOut:
        # Expiry bounds state to ACTIVE keys, not all keys ever. Under
        # the in-order arrival contract (processing time tracks event
        # time) it is also semantically safe: once idle past the window
        # the next event would be kept regardless. CAVEAT — the timeout
        # is PROCESSING-time, so after a >window processing-time idle
        # gap that is NOT an event-time gap (restart, backfill, replay
        # of historical timestamps) the dropped entry makes the next
        # event be KEPT even though its event-time gap to its
        # predecessor is inside the window — a divergence from the
        # batch twin beyond the documented late-arrival caveat. Re-run
        # the batch query at compaction time for exact closure.
        state.remove()
        return
    (last,) = state.get if state.exists else (None,)
    rows = sorted(
        (int(ts), int(eid))
        for pdf in pdfs
        for ts, eid in zip(pdf["ts_us"].tolist(), pdf["event_id"].tolist())
    )
    kept = []
    for ts, eid in rows:
        if last is None or ts - last >= DEBOUNCE_WINDOW_US:
            kept.append(
                {
                    "user_id": user_id,
                    "event_type": event_type,
                    "event_id": eid,
                    "ts_us": ts,
                }
            )
        last = ts
    state.update((last,))
    # Expire idle keys one window after their last event (processing
    # time ~ event time under the in-order arrival contract) — keeps
    # state at O(keys active within the window).
    state.setTimeoutDuration(DEBOUNCE_WINDOW_US // 1000)
    if kept:
        yield pd.DataFrame(kept)


def debounce_stream(events: DataFrame) -> DataFrame:
    """Streaming telemetry debounce over (user_id, event_type, event_id,
    ts_us) rows: suppress events arriving within DEBOUNCE_WINDOW_US of
    the previous same-key event. State is one long per live key —
    O(users × types), never O(events) — so it holds at any stream
    volume; the batch twin is ``events_dedup_within_window``."""
    return (
        events.select("user_id", "event_type", "event_id", "ts_us")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_fn,
            outputStructType=_DEBOUNCE_OUT,
            stateStructType=_DEBOUNCE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


_FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)
_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
        T.StructField("stage", T.IntegerType()),
    ]
)


def _funnel_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel stage state: first view, first click after it,
    first purchase after that (same ordering rule as the batch
    events_funnel). Emits the user's progress row whenever a batch
    advances (or first touches) their state — a funnel-progress stream
    the dashboard can upsert by user_id.

    ARRIVAL-ORDER ASSUMPTION: events are folded greedily in event-time
    order WITHIN each micro-batch, but state never rewinds across
    batches — a click arriving in a later batch than a view that
    event-time-precedes it still advances the funnel (both orderings
    fold the same), while a click whose matching view arrives only in a
    LATER batch is lost (the view cannot retroactively claim it). Exact
    agreement with the batch twin therefore requires cross-batch
    in-event-time-order arrival per user (true for the FIFO file source
    fed by time-ordered drops). For out-of-order streams use
    :func:`funnel_stream_watermarked` (buffers by watermark before
    folding, at the cost of O(lateness-window) state per user), or
    re-run the batch ``events_funnel`` at compaction time — same
    greedy-vs-closure tradeoff as :func:`near_dedup_stream` vs
    ``dedup_survivors_cc``."""
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    rows = sorted(
        (int(ts), str(et))
        for pdf in pdfs
        for ts, et in zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist())
    )
    changed = not state.exists
    for ts, et in rows:
        if et == "view" and t1 is None:
            t1, changed = ts, True
        elif et == "click" and t1 is not None and ts > t1 and t2 is None:
            t2, changed = ts, True
        elif et == "purchase" and t2 is not None and ts > t2 and t3 is None:
            t3, changed = ts, True
    state.update((t1, t2, t3))
    if changed:
        stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        yield pd.DataFrame(
            [{"user_id": user_id, "t1": t1, "t2": t2, "t3": t3, "stage": stage}]
        )


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming conversion funnel: per-user stage state over a stream of
    (user_id, event_type, ts_us) rows — the ``applyInPandasWithState``
    twin of the batch ``events_funnel`` (plans/relational.py). State is
    three longs per user — O(users), never O(events)."""
    return (
        events.select("user_id", "event_type", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=_FUNNEL_OUT,
            stateStructType=_FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TRANSITION_STATE = T.StructType(
    [
        T.StructField("last_event", T.StringType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)
_TRANSITION_OUT = T.StructType(
    [
        T.StructField("prev_event", T.StringType()),
        T.StructField("next_event", T.StringType()),
        T.StructField("n_transitions", T.LongType()),
    ]
)


def _transition_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental event-bigram counting per user: each batch folds the
    user's new events (event-time order) against the carried last event
    and emits per-(prev, next) INCREMENTS — an additive delta stream the
    consumer folds with a sum, so the running totals equal the batch
    ``events_transition_matrix`` over everything seen. Same cross-batch
    in-order-arrival contract as :func:`_funnel_fn` (state carries only
    the last event; it cannot rewind) — buffer upstream via the
    :func:`funnel_stream_watermarked` pattern for disordered streams."""
    state.hasTimedOut  # NoTimeout configured; no timeout branch needed
    rows = sorted(
        (int(ts), str(et))
        for pdf in pdfs
        for ts, et in zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist())
    )
    if not rows:
        return
    last_et, last_ts = state.get if state.exists else (None, None)
    counts: dict = {}
    for ts, et in rows:
        if last_et is not None:
            pair = (last_et, et)
            counts[pair] = counts.get(pair, 0) + 1
        last_et, last_ts = et, ts
    state.update((last_et, last_ts))
    if counts:
        yield pd.DataFrame(
            [
                {"prev_event": p, "next_event": n, "n_transitions": c}
                for (p, n), c in counts.items()
            ]
        )


def transition_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_transition_matrix``
    (plans/relational.py): per-user last-event state folds each batch
    into (prev, next) count increments; summing all emitted increments
    reproduces the batch matrix. State is TWO fields per user —
    O(users), never O(events)."""
    return (
        events.select("user_id", "event_type", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_fn,
            outputStructType=_TRANSITION_OUT,
            stateStructType=_TRANSITION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FUNNEL_WM_STATE = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_et", T.ArrayType(T.StringType())),
    ]
)


def _funnel_wm_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Watermark-buffered funnel fold: the out-of-order-safe form of
    :func:`_funnel_fn`.

    Incoming events are BUFFERED in state; only events whose event time
    has been passed by the watermark are folded (in event-time order).
    The watermark guarantees no still-earlier event can arrive later, so
    the greedy fold is deterministic under ANY cross-batch arrival order
    within the allowed lateness — the in-order arrival assumption
    documented on :func:`_funnel_fn` is discharged rather than assumed.
    State is O(events inside the watermark horizon) per user, bounded by
    the lateness window — the standard buffer-vs-exactness trade.
    """
    (user_id,) = key
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        t1, t2, t3, buf_ts, buf_et = state.get
        pending = list(zip(buf_ts or [], buf_et or []))
    else:
        t1 = t2 = t3 = None
        pending = []
    # A timed-out invocation (buffered events whose fold-time arrived
    # with no new data for this key) has empty `pdfs`; both paths share
    # the same fold below.
    for pdf in pdfs:
        pending.extend(
            (int(ts), str(et))
            for ts, et in zip(pdf["ts_us"].tolist(), pdf["event_type"].tolist())
        )
    pending.sort()
    ready = [(ts, et) for ts, et in pending if ts <= wm_us]
    keep = [(ts, et) for ts, et in pending if ts > wm_us]
    changed = False
    for ts, et in ready:
        if et == "view" and t1 is None:
            t1, changed = ts, True
        elif et == "click" and t1 is not None and ts > t1 and t2 is None:
            t2, changed = ts, True
        elif et == "purchase" and t2 is not None and ts > t2 and t3 is None:
            t3, changed = ts, True
    state.update(
        (t1, t2, t3, [ts for ts, _ in keep], [et for _, et in keep])
    )
    if keep:
        # Re-arm on EVERY invocation (timeouts clear per call): revisit
        # this key once the watermark passes its earliest buffered event,
        # even if no further data arrives for it.
        state.setTimeoutTimestamp(keep[0][0] // 1000)
    if changed:
        stage = 3 if t3 is not None else 2 if t2 is not None else 1
        yield pd.DataFrame(
            [{"user_id": user_id, "t1": t1, "t2": t2, "t3": t3, "stage": stage}]
        )


def funnel_stream_watermarked(
    events: DataFrame, *, watermark: str = "1 hour"
) -> DataFrame:
    """Out-of-order-safe streaming funnel: events buffer in state and
    fold only once the event-time watermark passes them, so a click
    arriving a batch BEFORE its user's earlier view still folds in the
    correct event-time order (within the lateness window). Input must
    carry ``user_id``, ``event_type``, and an event-time ``ts_utc``;
    ``ts_us`` is derived for the integer-µs fold shared with the batch
    ``events_funnel``. See :func:`funnel_stream` for the cheaper
    in-order-arrival form (no buffer, zero lateness tolerance)."""
    return (
        events.withWatermark("ts_utc", watermark)
        # ts_utc must flow INTO the stateful operator — projecting it
        # away detaches the watermark and getCurrentWatermarkMs raises.
        .select(
            "user_id",
            "event_type",
            "ts_utc",
            F.unix_micros("ts_utc").alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_wm_fn,
            outputStructType=_FUNNEL_OUT,
            stateStructType=_FUNNEL_WM_STATE,
            outputMode="append",
            # event-time timeout: a key with only buffered events is
            # re-invoked when the watermark passes them, without needing
            # new data for that key in the batch.
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def interval_join_stream(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    band: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "leftOuter",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the trailing ``band``.

    Streaming twin of the batch bucketed range join
    (plans/temporal.py range_join_clicks_before_purchase). Both inputs
    must carry ``user_id`` and an event-time column ``ts_utc``. The
    time-range predicate plus both watermarks lets Spark BOUND the join
    state: a buffered click is dropped once the purchase-side watermark
    passes ``click.ts_utc + band``, so state is O(events per watermark
    window), not O(stream). Outer semantics (null click for purchases
    with no match) are legal exactly because the state is bounded —
    Spark can prove no future match will arrive.

    At 100 TB/day this is the shape to keep: one shuffle per side on
    user_id, state proportional to the band, no re-reading of history.
    """
    p = purchases.alias("p")
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts_utc").alias("c_ts_utc"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_ts_utc", watermark)
    p = p.withWatermark("ts_utc", watermark)
    return p.join(
        c,
        F.expr(
            f"""
            c_user_id = user_id AND
            c_ts_utc >= ts_utc - INTERVAL {band} AND
            c_ts_utc < ts_utc
            """
        ),
        join_type,
    ).select(
        "event_id", "user_id", "ts_utc", "c_ts_utc", "click_value"
    )


def collector_stream(
    spark: SparkSession,
    fetch_batch: Callable[[int], list[dict]],
    bronze_new_dir: str,
    checkpoint_dir: str,
    *,
    rows_per_second: int = 10,
    pulls_per_file: int = 10,
    available_now: bool = False,
):
    """ST1: the collector loop (collector.py:110-128) as a streaming job.

    The reference polls an HTTP API; here a rate source drives the
    cadence and ``fetch_batch(n)`` performs the pull (driver-side, like
    the reference), with pool enrichment applied in the batch body and
    one bronze file per ``pulls_per_file`` accumulated pulls.
    """
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()

    def process(batch: DataFrame, batch_id: int) -> None:
        n = batch.count()
        if n == 0:
            return
        rows = fetch_batch(n)
        if not rows:
            return
        df = spark.createDataFrame(rows, BRONZE_PRODUCTS)
        df.write.mode("append").json(f"{bronze_new_dir}/pull_{batch_id}")

    writer = (
        rate.writeStream.option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{pulls_per_file} seconds")
        .foreachBatch(process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_counters_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streaming count-min-sketch maintenance over a document stream:
    each micro-batch folds its tokens into (j, bucket) counter
    increments and writes them to a ``batch_id={N}`` partition
    (OVERWRITE per batch — replay-idempotent, same contract as
    ``documents_ingest_stream``'s sink). Because CMS merge is plain
    counter ADDITION, the authoritative sketch is the sum over batch
    partitions — :func:`read_cms_counters` folds it on read, so the
    "merge" costs one d×w-row agg and no read-modify-write of shared
    state. Seeds/width are shared with the batch ``cms_heavy_hitters``
    query (plans/approx.cms_bucket_structs): a streamed sketch and a
    batch sketch over the same rows are bit-identical — mergeability
    is proven by equality in tests, not claimed.
    """
    from ..functions import tokens
    from ..plans.approx import cms_bucket_structs

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.select(
                F.explode(
                    F.flatten(
                        F.transform(tokens("text"), cms_bucket_structs)
                    )
                ).alias("b")
            )
            .groupBy(F.col("b.j").alias("j"), F.col("b.bucket").alias("bucket"))
            .agg(F.count("*").alias("c"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_cms_counters(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read of the streamed CMS: sum counters across the
    compacted base (if any) + live batch partitions (CMS merge ==
    addition; tombstoned ids ignored — sketch_store.py). d×w rows
    out."""
    from .sketch_store import live_store_frame

    return (
        live_store_frame(spark, out_dir)
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )


#: Bucket width of the streamed value histogram, in exact integer
#: cents ($2,500). The percentile estimate's error bound is ONE bucket
#: width; each micro-batch's PARTIAL is O(value_range / width) rows,
#: constant in that batch's volume.
PCT_STREAM_BUCKET_C = 250_000


def value_histogram_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streaming mergeable value-histogram maintenance over an orders
    stream — the QUANTILE member of the streamed-sketch family
    (``cms_counters_stream`` = frequencies, ``wau_sketches_stream`` =
    distincts, this = percentiles; the latency/price-SLO monitor an
    ops dashboard polls). Each micro-batch buckets its exact integer
    cents — ``floor(cents / width)``, the signed-safe floor variant of
    the batch ``order_value_histogram`` kernel (``DIV`` truncates
    toward zero, which would fold values in ``(-width, 0)`` into
    bucket 0 and break the error bound for refunds/credits) — and
    writes per-bucket counts to a ``batch_id={N}`` partition
    (OVERWRITE per batch — replay-idempotent, the family's shared sink
    contract). Histogram merge is plain counter ADDITION, so the
    authoritative sketch is the per-bucket sum across batch partitions
    and no state store is needed at all; a batch-computed histogram
    over the same rows with the same kernel is BIT-IDENTICAL to the
    merged stream (equality asserted in tests — mergeability proven,
    not claimed). :func:`read_streamed_percentiles` answers quantile
    queries from the merged histogram.

    Store growth: the per-batch PARTIAL is bounded by
    O(value_range / width) rows however large the batch, but the store
    accumulates one such partition per micro-batch — a long-lived
    continuous stream periodically runs
    :func:`sketch_store.compact_value_histogram_store` (shared with the
    CMS/WAU stores), which folds COMMITTED batch partitions into a
    single base, tombstones them by watermark so a checkpoint replay of
    a compacted micro-batch cannot double-count, and publishes
    atomically — see streaming/sketch_store.py for the replay-safety
    proof shape.
    """
    schema = T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    from ..plans.spec import cents  # the repo's one exact-cents policy

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.where(F.col("price").isNotNull())
            .select(
                F.floor(
                    cents("price") / F.lit(PCT_STREAM_BUCKET_C)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_streamed_percentiles(
    spark: SparkSession, out_dir: str, qs: tuple = (0.5, 0.9, 0.99)
) -> dict:
    """Quantile estimates from the streamed histogram: fold the bucket
    counts (merge = addition), walk the cumulative distribution to the
    rank target ``floor(q*(n-1))``, and report each target bucket's
    midpoint in dollars. The bound, stated precisely: the FLOOR-RANK
    ORDER STATISTIC at ``floor(q*(n-1))`` lies inside the reported
    bucket, so the estimate is within ONE bucket width
    (``PCT_STREAM_BUCKET_C``) of that order statistic — an EXACT
    bound, unlike a sample sketch's probabilistic one. An
    INTERPOLATING percentile (Spark's ``percentile``, DuckDB's
    ``quantile_cont``) can sit farther away when the two straddling
    order statistics are more than a bucket apart (sparse tails); the
    contract here is order-statistic-relative. The driver-side walk
    folds O(value_range / width) merged bucket rows. A store no batch
    has written to yet (dashboard polling a just-started stream)
    reports the ``n = 0`` shape instead of raising."""
    from pyspark.errors import AnalysisException

    from .sketch_store import live_store_frame

    try:
        merged = (
            live_store_frame(spark, out_dir)
            .groupBy("bucket")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
    except AnalysisException:  # no batch committed yet (PATH_NOT_FOUND
        merged = []            # / schema-less dir) -> empty-store shape
    return _histogram_percentiles(
        [(r["bucket"], r["c"]) for r in merged], qs
    )


def _histogram_percentiles(bucket_counts, qs) -> dict:
    """The pure CDF walk behind :func:`read_streamed_percentiles`
    (factored out so the one-bucket-width bound is property-testable
    without a stream: tests/test_streaming.py drives it over arbitrary
    signed price lists)."""
    rows = sorted(bucket_counts)
    n = sum(c for _, c in rows)
    out = {"n": n}
    if not n:
        out.update({f"p{q}": None for q in qs})
        return out
    for q in qs:
        target = math.floor(q * (n - 1))
        cum = 0
        for bucket, c in rows:
            cum += c
            if cum > target:
                out[f"p{q}"] = (
                    (bucket * PCT_STREAM_BUCKET_C)
                    + PCT_STREAM_BUCKET_C / 2.0
                ) / 100.0
                break
    return out


def wau_sketches_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streaming twin of ``plans/approx.sliding_wau_hll_union``:
    maintains per-day HLL user sketches over an events stream. Each
    micro-batch folds its rows into day-grain ``hll_sketch_agg``
    sketches written to a ``batch_id={N}`` partition (OVERWRITE per
    batch — replay-idempotent, same sink contract as
    :func:`cms_counters_stream`). State is the sketch store itself: a
    few KB per (day, batch) — never the raw user ids — so a year of
    days costs megabytes while the events stream can be anything.

    Merge-on-read (:func:`read_wau_estimates`) unions the per-batch
    sketches per day with ``hll_union_agg`` (HLL union = register-wise
    max, lossless at equal lgConfigK) and reuses the batch query's
    window-explode estimator, so the streamed trailing-7-day estimate
    equals the batch estimate over the same rows — parity asserted in
    tests (tests/test_streaming.py), matching the CMS pair's proof
    pattern.
    """
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.where(F.col("user_id").isNotNull())
            .select(F.to_date("ts").alias("day"), "user_id")
            .groupBy("day")
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_wau_estimates(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read of the streamed WAU sketch store: union per-batch
    day sketches, then the shared trailing-window estimator —
    ``(spine_day, wau_est)`` out."""
    from ..plans.approx import wau_estimate_from_day_sketches

    from .sketch_store import live_store_frame

    daily = (
        live_store_frame(spark, out_dir)
        .groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )
    return wau_estimate_from_day_sketches(daily)


def covariance_sums_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streaming twin of ``plans/simsearch.embedding_covariance`` — the
    FIFTH member of the streamed-sketch family (frequencies / distincts
    / percentiles / samples / now SECOND MOMENTS): maintains the exact
    fixed-point covariance sufficient statistics over an embedding
    stream. Every partial is a long SUM keyed by (i, j) — pair
    products, per-dim sums, and the row count ride one (i, j, v)
    contract (``covariance_partials``, shared with the batch query) —
    so each micro-batch writes <= 2,145 rows to its replay-idempotent
    ``batch_id={N}`` partition and the authoritative matrix is
    addition across partitions. A batch-computed covariance over the
    same rows is BIT-IDENTICAL to the merged stream (same fold, same
    emission expression — parity asserted in tests). The drift monitor
    this feeds: a PQ/OPQ deployment watches the streamed matrix move
    away from the one its codebook was trained on and triggers the
    retrain (``embedding_pq_codebook``) when reconstruction error
    follows.
    """
    from ..plans.simsearch import COV_FP, covariance_partials

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        e = batch.where(F.col("embedding").isNotNull()).select(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * COV_FP, 0).cast("long"),
            ).alias("xfp")
        )
        (
            covariance_partials(e)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_streamed_covariance(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read of the streamed covariance store: sum the (i, j)
    partials across base + live partitions, then the shared emission —
    (i, j, n, cov) out, bit-identical to the batch query over the same
    rows."""
    from ..plans.simsearch import covariance_from_sums

    from .sketch_store import live_store_frame

    sums = (
        live_store_frame(spark, out_dir)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    return covariance_from_sums(sums)


def pca_top_component_from_store(
    spark: SparkSession, out_dir: str, *, iters: int = 1000
) -> dict:
    """Top principal component FROM THE STREAMED STORE (VERDICT r11
    #6): merge-on-read of the covariance sums, then the exact same
    power iteration the batch query runs
    (``plans/simsearch._power_iteration`` is shared code). Because the
    sufficient statistics are associative long sums, a stream that saw
    the same rows — through any batching and any number of compactions
    — hands the iteration a bit-identical matrix, so a streaming
    deployment's drift monitor and a batch recompute agree on the
    component EXACTLY (parity asserted in tests/test_sketch_compaction
    across a compaction)."""
    from ..plans.simsearch import _power_iteration

    return _power_iteration(
        read_streamed_covariance(spark, out_dir).collect(), iters=iters
    )


def drift_from_store(
    spark: SparkSession, out_dir: str, ref: DataFrame
) -> DataFrame:
    """Embedding drift of the STREAMED corpus against a frozen
    reference (VERDICT r12 #2, streaming leg): merge-on-read of the
    covariance store's (i, j, v) sums, adapt the count / per-dim /
    diagonal rows into per-dimension moment frames
    (``plans/simsearch.drift_sums_from_cov_sums`` — nothing is
    recomputed), and standardize against ``ref`` — a (d, n, s, ss)
    frame, typically the ANN index's persisted ``stats`` artifact
    (``spark.read.parquet(f"{index_dir}/stats")``). Because every sum
    is an associative long, the streamed reading is bit-identical to a
    batch recompute over the same rows through any batching and any
    number of compactions — so the drift monitor an operator crons on
    the INGEST STREAM needs no corpus rescan at all: the stream already
    maintains the sufficient statistics."""
    from ..plans.simsearch import drift_frame, drift_sums_from_cov_sums

    from .sketch_store import live_store_frame

    sums = (
        live_store_frame(spark, out_dir)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    return drift_frame(ref, drift_sums_from_cov_sums(sums))


def opq_rotation_from_store(spark: SparkSession, out_dir: str):
    """OPQ rotation learned FROM THE STREAMED STORE: the same partial
    Jacobi + snake allocation as ``plans/simsearch.opq_rotation``, fed
    the merged streamed covariance instead of a batch scan — so a
    streaming deployment can retrain its PQ rotation (and compare it to
    the serving index's) without ever rescanning the corpus. Returns
    ``(V, alloc)``; bit-identical to a batch run over the same rows by
    the associative-long-sums argument of
    :func:`pca_top_component_from_store`."""
    from ..plans.simsearch import _opq_alloc, _opq_jacobi

    rows = read_streamed_covariance(spark, out_dir).collect()
    A, V = _opq_jacobi(rows)
    return V, _opq_alloc(A)


#: Per-source reservoir size of the streamed weighted sample (test
#: scale; a deployment sets each source's allocation here — e.g. the
#: ``weighted_sample_allocated`` Neyman budget).
WSAMPLE_STREAM_K = 3


def weighted_sample_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    k: int = WSAMPLE_STREAM_K,
    available_now: bool = True,
):
    """Streaming twin of ``plans/sampling.weighted_sample_aes``: a
    length-weighted without-replacement sample of K docs per source,
    maintained INCREMENTALLY over a document stream — the fourth member
    of the streamed-sketch family (frequencies / distincts /
    percentiles / now SAMPLES). The Efraimidis–Spirakis construction is
    what makes the sample mergeable: each row's exponential clock is a
    pure function of its content hash and weight, and "keep the K
    smallest clocks" is an associative fold — so each micro-batch
    writes only its OWN per-source K-smallest rows to a ``batch_id={N}``
    partition (OVERWRITE per batch, the family's replay-idempotent sink
    contract) and the authoritative sample is the same fold over the
    store (:func:`read_streamed_weighted_sample`). No state store, no
    read-modify-write: the per-batch partial is <= K x |sources| rows
    however large the batch, and a batch-computed sample over the same
    rows is IDENTICAL to the merged stream (parity asserted in
    tests/test_sketch_compaction.py — mergeability proven, not
    claimed). Compaction rides :func:`..streaming.sketch_store.
    compact_weighted_sample_store` with the same fold.
    """
    from ..plans.sampling import _aes_key_micro

    from .sketch_store import wsample_topk_fold

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        rows = batch.where(
            F.col("doc_id").isNotNull() & (F.col("n_chars") > 0)
        ).select(
            "source", _aes_key_micro().alias("e_micro"), "doc_id", "n_chars"
        )
        wsample_topk_fold(rows, k).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_streamed_weighted_sample(
    spark: SparkSession, out_dir: str, *, k: int = WSAMPLE_STREAM_K
) -> DataFrame:
    """Merge-on-read of the streamed weighted sample: the shared
    per-source K-smallest fold over base + live partitions, emitted
    with the batch twin's (doc_id, source, n_chars, e_micro, rk)
    shape."""
    from .sketch_store import live_store_frame, wsample_topk_fold

    w = Window.partitionBy("source").orderBy("e_micro", "doc_id")
    return (
        wsample_topk_fold(live_store_frame(spark, out_dir), k)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .select("doc_id", "source", "n_chars", "e_micro", "rk")
    )


# ---------------------------------------------------------------------------
# Bloom-state first-seen filter: bounded-FOREVER approximate dedup
# ---------------------------------------------------------------------------

#: Default sharding/sizing of the streaming first-seen Bloom filter
#: (per-call overridable via :func:`bloom_first_seen_stream` kwargs).
#: Total state = shards x bits_per_shard/8 bytes (default 64 x 16 KiB
#: = 1 MiB) and NEVER grows; at ~9.6 bits/key that absorbs ~875k
#: distinct keys before the false-drop rate passes ~1%. Both knobs
#: scale linearly — 1024 shards x 1 MiB handles ~850M keys in 1 GiB
#: of total state spread across the cluster's state store — but ONLY
#: against a FRESH checkpoint: changing shards remaps key->shard so
#: absorbed keys would pass again (a silent contract break), and
#: changing bits_per_shard re-bases the bit positions. BOTH knobs are
#: now guarded symmetrically (ADVICE r8): each shard's state carries
#: its bitset (length pins bits_per_shard) AND the shard count it was
#: built under, and the stateful fn fails fast on either mismatch —
#: resizing always means a new checkpoint plus a re-seed from
#: reprocessed history. Monitor saturation via
#: ``read_bloom_seen_fill``; past ``BLOOM_SEEN_FILL_WARN`` the stream
#: surfaces a ``saturation_warning`` observed metric (operational
#: playbook: SCALE.md).
BLOOM_SEEN_SHARDS = 64
BLOOM_SEEN_BITS_PER_SHARD = 1 << 17
BLOOM_SEEN_K = 7

#: Shard fill ratio past which the stream raises its saturation flag.
#: At fill 0.5 a k=7 filter's false-drop rate is ~(0.5)^7 ~ 0.8% and
#: climbing steeply — the rotate-now threshold, not a hard stop.
BLOOM_SEEN_FILL_WARN = 0.5


def _bloom_seen_positions(key: str, m_bits: int, k: int) -> list[int]:
    # ONE md5 per key, split into (h1, h2) and extended by Kirsch-
    # Mitzenmacher double hashing — same sized fp rate and the same
    # no-false-negative property as k independent hashes at ~1/k the
    # digest cost (the plans/textops.py minhash scheme's rationale,
    # applied to the per-row streaming hot loop). h2 forced odd so the
    # stride never degenerates to 0. Deterministic across processes/
    # restarts (hashlib, not PYTHONHASHSEED-dependent hash()); no
    # JVM-hash consistency needed — set and test both happen here,
    # inside one shard's state.
    import hashlib

    d = hashlib.md5(key.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_first_seen_stream(
    rows: DataFrame,
    *,
    shards: int = BLOOM_SEEN_SHARDS,
    bits_per_shard: int = BLOOM_SEEN_BITS_PER_SHARD,
    k: int = BLOOM_SEEN_K,
    fill_warn: float = BLOOM_SEEN_FILL_WARN,
) -> DataFrame:
    """Streaming approximate first-seen filter over (doc_id, key) rows
    — the key is caller-computed (e.g. ``sha2`` of normalized text,
    JVM-side, before this operator). Keys shard by ``xxhash64 mod
    shards`` so each state group owns a fixed-size bitset slice; shard
    assignment is JVM-side and sticky, bit arithmetic is pandas-side
    within the shard. Emits only rows whose key was never seen across
    ALL prior micro-batches; total state is constant (shards x
    bits_per_shard bits) regardless of stream volume or key
    cardinality. The trade versus the exact ``dedup_stream``: a sized
    false-DROP rate (never a duplicate pass) in exchange for state
    that an unbounded key universe cannot grow. Rows with a NULL key
    or NULL doc_id are dropped here: pandas would coerce a NULL key
    into the literal string 'None' and dedup all such rows as one key,
    and a NULL doc_id arrives as float NaN whose int() conversion
    would kill the stream.

    Sizing knobs are per-call (the module constants are defaults) and
    FROZEN per checkpoint: each shard's state stores the shard count it
    was built under alongside its bitset, and the fold fails fast when
    EITHER ``bits_per_shard`` (bitset length) or ``shards`` (stored
    fingerprint) no longer matches — the two knobs previously carried
    asymmetric safety (ADVICE r8): a shard-count change silently
    remapped keys so absorbed keys passed again. Resizing = fresh
    checkpoint + re-seed from reprocessed history.

    Observability — ``observe()`` ->
    ``StreamingQueryProgress.observedMetrics``:

    - ``bloom_seen_in`` (``n_in``): rows entering the gate per batch.
    - ``bloom_seen_kept`` (``n_kept``, ``max_shard_fill``,
      ``saturation_warning``): rows emitted, the fullest emitting
      shard's post-fold bit-fill ratio, and a 0/1 flag that trips once
      that fill reaches ``fill_warn`` — the rotate-the-checkpoint
      alarm (operational playbook: SCALE.md "Bloom first-seen
      saturation"). A falling kept/in ratio alone is ambiguous
      (duplicate-heavy stream vs saturation); the fill metric
      disambiguates inline. Caveat: the metric folds over EMITTED
      rows, so a shard so saturated it emits nothing reports no fill
      that batch (it also logs a worker-side warning the moment its
      fold crosses ``fill_warn``); ground truth for dashboards is
      :func:`read_bloom_seen_fill` over the checkpoint's state store,
      which reads every shard regardless of emission.

    Upgrade note: this state layout (v2: ``bits`` + ``shards``) is not
    readable from a v1 single-field checkpoint — Spark's state-schema
    compatibility check refuses the added field — so upgrading an
    in-flight v1 stream also takes the rotate-and-reseed path even
    with unchanged sizing.
    """
    if shards <= 0:
        raise ValueError(
            f"bloom_first_seen_stream: shards={shards} must be positive "
            "(pmod against 0 would NULL every shard key)"
        )
    if bits_per_shard <= 0 or bits_per_shard % 8:
        raise ValueError(
            f"bloom_first_seen_stream: bits_per_shard={bits_per_shard} "
            "must be a positive multiple of 8 — positions are computed "
            "mod bits_per_shard but stored in bits_per_shard//8 bytes, "
            "so a remainder would index past the bitset mid-stream"
        )
    if k <= 0:
        raise ValueError(f"bloom_first_seen_stream: k={k} must be positive")
    n_bytes = bits_per_shard // 8
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("__shard_fill", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("bits", T.BinaryType()),
            T.StructField("shards", T.IntegerType()),
        ]
    )

    def _first_seen_fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-shard first-seen gate: a row passes iff at least one of
        its key's k bits is still unset, then its bits are set.
        Duplicates of an emitted key NEVER pass again (no false
        negatives in the bitset); a never-seen key can be falsely
        suppressed at the sized fp rate. Rows fold in (key, doc_id)
        order, so intra-batch duplicate groups deterministically emit
        their lowest doc_id. State is the bitset itself — constant
        bytes per shard, NO timeout: unlike the exact ``dedup_stream``
        (state = one entry per distinct key, bounded only by its
        watermark expiry), this holds its footprint FOREVER over an
        unbounded key universe, which is the 100 TB contract for
        global never-reprocess dedup."""
        if state.exists:
            stored_bits, stored_shards = state.get
            bits = bytearray(stored_bits)
            if len(bits) != n_bytes:
                raise ValueError(
                    f"bloom_first_seen_stream: checkpointed bitset is "
                    f"{len(bits)} bytes but bits_per_shard now implies "
                    f"{n_bytes} — resizing re-bases bit positions and "
                    "requires a FRESH checkpoint (and a re-seed from "
                    "reprocessed history)"
                )
            if int(stored_shards) != shards:
                raise ValueError(
                    f"bloom_first_seen_stream: checkpoint was built "
                    f"with shards={int(stored_shards)} but the query "
                    f"now runs shards={shards} — a shard-count change "
                    "remaps key->shard so absorbed keys would pass "
                    "again; resizing requires a FRESH checkpoint (and "
                    "a re-seed from reprocessed history)"
                )
        else:
            bits = bytearray(n_bytes)
        rows_ = sorted(
            (str(k_), int(d))
            for pdf in pdfs
            for k_, d in zip(pdf["key"].tolist(), pdf["doc_id"].tolist())
        )
        kept = []
        changed = False
        for k_, doc_id in rows_:
            pos = _bloom_seen_positions(k_, bits_per_shard, k)
            if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
                continue  # seen before (or sized-rate false positive)
            for p in pos:
                bits[p >> 3] |= 1 << (p & 7)
            changed = True
            kept.append({"doc_id": doc_id, "key": k_})
        if changed:
            # duplicate-heavy steady state flips no bits — skip the
            # state-store rewrite then (the _funnel_fn `changed`
            # pattern); unmodified GroupState persists across batches
            # without update.
            state.update((bytes(bits), shards))
        # one C-level popcount over the whole bitset (~free vs the
        # per-key fold above); logged loud even when nothing emits
        fill = int.from_bytes(bytes(bits), "big").bit_count() / float(
            bits_per_shard
        )
        if fill >= fill_warn:
            import logging

            logging.getLogger(__name__).warning(
                "bloom_first_seen_stream shard %s fill %.3f >= %.3f: "
                "false-drop rate is past its sized bound — rotate to a "
                "fresh checkpoint and re-seed (SCALE.md)",
                key[0],
                fill,
                fill_warn,
            )
        if kept:
            yield pd.DataFrame(kept).assign(__shard_fill=fill)

    return (
        rows.select("doc_id", "key")
        .where(F.col("key").isNotNull() & F.col("doc_id").isNotNull())
        .observe("bloom_seen_in", F.count(F.lit(1)).alias("n_in"))
        .withColumn(
            "__shard",
            F.pmod(F.xxhash64("key"), F.lit(shards)),
        )
        .groupBy("__shard")
        .applyInPandasWithState(
            _first_seen_fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .observe(
            "bloom_seen_kept",
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__shard_fill").alias("max_shard_fill"),
            F.max(
                (F.col("__shard_fill") >= F.lit(float(fill_warn))).cast(
                    "int"
                )
            ).alias("saturation_warning"),
        )
        .drop("__shard_fill")
    )


def read_bloom_seen_fill(
    spark: SparkSession,
    checkpoint_dir: str,
    *,
    k: int = BLOOM_SEEN_K,
    fill_warn: float = BLOOM_SEEN_FILL_WARN,
) -> dict:
    """Saturation monitor for :func:`bloom_first_seen_stream`: read the
    checkpointed bitsets back through Spark's state-store data source
    and report the bit fill ratio plus the implied absorbed-key count
    (``n ~= -(m/k) ln(1 - fill)``, the standard Bloom inversion). The
    false-drop rate is only "sized" while fill stays under ~50%
    (~9.6 bits/key); past that it climbs toward dropping EVERY new key
    as seen — and from the outside that is indistinguishable from a
    duplicate-heavy stream, so dashboards should alarm on fill, not on
    kept/in. Driver-side popcount is bounded by SHARDS rows x the
    bitset bytes — the state's constant total size, not the stream's.
    """
    # applyInPandasWithState wraps the user state struct in a
    # `groupState` field in the state-store reader's value schema
    rows = (
        spark.read.format("statestore")
        .load(checkpoint_dir)
        .select(F.col("value.groupState.bits").alias("bits"))
        .collect()
    )
    # shard size comes from the bitsets themselves, never from a
    # caller-passed knob — a forgotten per-call bits_per_shard would
    # silently misreport fill by the size ratio (code review r9); k
    # still must match the stream's k for the absorbed-key inversion
    m_total = sum(len(r["bits"]) * 8 for r in rows if r["bits"])
    set_bits = sum(
        bin(b).count("1") for r in rows if r["bits"] for b in r["bits"]
    )
    fill = set_bits / m_total if m_total else 0.0
    est_keys = (
        -(m_total / k) * math.log(1.0 - fill)
        if 0.0 < fill < 1.0
        else (0.0 if fill == 0.0 else float("inf"))
    )
    return {
        "shards": len(rows),
        "m_total_bits": m_total,
        "set_bits": set_bits,
        "fill_ratio": fill,
        "est_absorbed_keys": est_keys,
        # LEVEL-HELD alarm (code review r9): the stream's observed
        # saturation_warning rides on EMITTED rows, so a filter
        # saturated into silence reports NULL there — this flag, read
        # from the state store itself, stays up as long as the fill
        # does; dashboards alarm on EITHER under the same name.
        "saturation_warning": fill >= fill_warn,
    }


def rotate_bloom_first_seen(
    spark: SparkSession,
    query,
    src_dir: str,
    new_checkpoint_dir: str,
    sink,
    *,
    warmup: DataFrame | None = None,
    schema: str = "doc_id long, key string",
    shards: int = BLOOM_SEEN_SHARDS,
    bits_per_shard: int = BLOOM_SEEN_BITS_PER_SHARD,
    k: int = BLOOM_SEEN_K,
    fill_warn: float = BLOOM_SEEN_FILL_WARN,
    available_now: bool = True,
):
    """The SCALE.md saturation playbook's ROTATE step, as one call
    (VERDICT r9 #5 — the playbook was documentation + alarm only):
    stop the saturated ``bloom_first_seen_stream`` query, start a
    successor gate with (typically larger) fresh sizing against a
    FRESH checkpoint, and re-arm suppression by replaying history.

    Re-seed semantics: the successor's fresh checkpoint makes the file
    source re-read EVERYTHING retained in ``src_dir`` from the start,
    so every retained key folds into the new (empty) filter before new
    traffic — suppression continues without a state migration (which
    the sizing fingerprints deliberately make impossible: a resize
    re-bases bit positions and remaps key->shard). Keys whose source
    files have aged out of retention are the gap ``warmup`` plugs:
    a batch frame of historical ``(doc_id, key)`` rows appended to
    ``src_dir`` ahead of the restart, absorbed in the successor's
    first batches. The documented cost is one re-emission of each
    replayed first-seen key during the reseed window — downstream
    sinks are keyed upserts, so re-emitted keys collapse idempotently
    — after which re-seen keys never pass again (tested).

    ``sink`` is the successor's ``foreachBatch`` callable (usually the
    same one the stopped query ran). Returns the started successor
    ``StreamingQuery``; monitor it with :func:`read_bloom_seen_fill`
    over ``new_checkpoint_dir``.
    """
    import os

    if query is not None and query.isActive:
        query.stop()
        query.awaitTermination(60)
    ckpt_local = new_checkpoint_dir
    for prefix in ("file://", "file:"):
        if ckpt_local.startswith(prefix):
            ckpt_local = ckpt_local[len(prefix):]
    if os.path.isdir(ckpt_local) and os.listdir(ckpt_local):
        raise ValueError(
            f"rotate_bloom_first_seen: {new_checkpoint_dir} is not a "
            "FRESH checkpoint — resuming an existing checkpoint would "
            "trip the sizing fingerprints (or worse, silently reuse "
            "the saturated state). Rotation always targets a new "
            "checkpoint directory."
        )
    if warmup is not None:
        # history beyond src_dir's retention, re-absorbed via the same
        # source the live keys arrive on (the successor reads src_dir
        # from scratch, so these fold in with the retained files)
        warmup.select("doc_id", "key").write.mode("append").json(src_dir)
    stream = spark.readStream.schema(schema).json(src_dir)
    gated = bloom_first_seen_stream(
        stream,
        shards=shards,
        bits_per_shard=bits_per_shard,
        k=k,
        fill_warn=fill_warn,
    )
    writer = gated.writeStream.foreachBatch(sink).option(
        "checkpointLocation", new_checkpoint_dir
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def copurchase_counts_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Streamed co-purchase sufficient statistics — the SIXTH member of
    the mergeable-sketch family (frequencies / distincts / percentiles
    / samples / second moments / now RULE-MINING COUNTS): each
    micro-batch of COMPLETE baskets — (l_orderkey, parts array, ts);
    the stream contract is one record per finished order, so a basket
    never splits across batches — contracts to (i, j, v) long partials
    on the covariance store's key scheme: in-basket pair counts
    (i < j part keys), per-item basket degrees (j = -1), and one
    (-1, -1, 1) basket-count row. Every statistic downstream of rule
    mining (support, confidence, lift, G-test significance) is a pure
    expression over per-key SUMS of these rows, so the merged store
    reconstructs the batch answer exactly
    (``read_streamed_rule_significance`` shares the emission with the
    oracle-gated ``plans/graph.copurchase_rule_significance``).
    Replay-idempotent ``batch_id={N}`` partitions; compaction =
    ``compact_copurchase_store`` (the covariance store's fold)."""
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("parts", T.ArrayType(T.LongType())),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = _file_stream(spark, src_dir, schema, archive_dir=None)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        b = batch.where(
            F.col("parts").isNotNull() & (F.size("parts") > 0)
        ).select(F.array_sort(F.array_distinct("parts")).alias("__ps"))
        # In-basket pair expansion via the shared codegen
        # posexplode+slice helper (optimization r15) — the batch
        # copurchase family's form; the previous transform×transform
        # struct build ran in the interpreted lambda evaluator.
        # Identical (i < j, v=1) pair multiset; the groupBy below is
        # order-insensitive.
        pairs = unordered_pair_rows(b, "__ps", "i", "j").select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.lit(1).cast("long").alias("v"),
        )
        degs = b.select(F.explode("__ps").alias("i")).select(
            F.col("i").cast("long").alias("i"),
            F.lit(-1).cast("long").alias("j"),
            F.lit(1).cast("long").alias("v"),
        )
        baskets = b.select(
            F.lit(-1).cast("long").alias("i"),
            F.lit(-1).cast("long").alias("j"),
            F.lit(1).cast("long").alias("v"),
        )
        (
            pairs.unionByName(degs)
            .unionByName(baskets)
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    writer = stream.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def read_streamed_rule_significance(
    spark: SparkSession, out_dir: str, *, min_support: int | None = None
) -> DataFrame:
    """Merge-on-read of the co-purchase counts store into the G-test
    rule report: per-(i, j) SUM across base + live partitions, split
    the key space back into pairs / degrees / basket count, then the
    SAME emission as the batch query
    (``plans/graph.rule_significance_frame``) — bit-identical to a
    batch run over the same baskets."""
    from ..plans.graph import MIN_SUPPORT, rule_significance_frame

    from .sketch_store import live_store_frame

    ms = MIN_SUPPORT if min_support is None else min_support
    merged = (
        live_store_frame(spark, out_dir)
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    pairs = merged.where(
        (F.col("i") >= 0) & (F.col("j") >= 0) & (F.col("v") >= ms)
    ).select(
        F.col("i").alias("x"), F.col("j").alias("y"), F.col("v").alias("c")
    )
    deg = merged.where((F.col("j") == -1) & (F.col("i") >= 0))
    da = deg.select(F.col("i").alias("x"), F.col("v").alias("n_a"))
    db = deg.select(F.col("i").alias("y"), F.col("v").alias("n_b"))
    total = merged.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n_baskets")
    )
    base = (
        pairs.join(da, "x").join(db, "y").crossJoin(F.broadcast(total))
    )
    return rule_significance_frame(base)

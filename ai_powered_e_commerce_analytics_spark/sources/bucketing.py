"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Bucketing pre-partitions (and pre-sorts) the stored table by
the join key, so two tables bucketed by the same key into the same
bucket count join with ZERO exchanges — each task merge-joins bucket i
of A with bucket i of B straight off storage. The write pays the shuffle
once; every subsequent join (and `groupBy` on the key) is exchange-free.

Bucketing metadata lives in the session catalog (`saveAsTable`); plain
`spark.read.parquet` of the same files would NOT know about the layout.

Gotcha (measured): with the default
``spark.sql.sources.bucketing.autoBucketedScan.enabled=true``, Spark
keeps the bucketed scan only when a join/aggregation benefits from the
distribution and silently DROPS bucket-FILTER pruning on filter-only
probes (e.g. reading nprobe IVF lists by ``cid``). Set it to ``false``
for point/list-probe workloads — the plan then shows
``SelectedBucketsCount: n of m``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    *,
    buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. ``path`` makes it an external table; otherwise it lands
    in the session warehouse dir.

    Pick ``buckets`` once per key domain and REUSE it across every table
    sharing that key — co-location only holds for equal bucket counts.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-count bucketed tables, forcing the
    merge-join path (a broadcast would hide the co-location benefit this
    helper exists for). With matching layouts the plan has NO shuffle
    exchange — verify with ``.explain()``."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), keys, how
    )

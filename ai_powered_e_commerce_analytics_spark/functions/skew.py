"""Skew-mitigation helpers (SURVEY.md §4 scale notes; SCALE.md §2.1).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized sort-merge partitions. These helpers
cover the cases AQE can't:

- a skewed shuffle join where the non-skewed side is too big to
  broadcast (AQE splits partitions of the *skewed* side, but every
  split still fetches the full matching partition of the other side);
- holistic aggregation state that concentrates on hot keys
  (``collect_list``/``collect_set`` — map-side partial aggregation
  doesn't shrink those).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets).

    Built from a hash of ALL columns rather than ``rand()``: a
    non-deterministic expression feeding a shuffle can duplicate or drop
    rows under partial stage retry (Spark recomputes only lost map
    tasks, and a rerun ``rand()`` re-routes rows). Content-identical
    duplicate rows share a salt, which is fine — skew means one KEY with
    many distinct rows, and those spread uniformly.
    """
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT (skewed) side salted and the RIGHT side
    replicated ``buckets``× — splits each hot key across ``buckets``
    reduce partitions.

    Join runs on ``(on…, __salt)``: each left row carries one salt value,
    and the right side is exploded once per salt value so every
    (key, salt) pair finds its match. Semantics match
    ``left.join(right, on, how)`` for ``inner``/``left`` joins (the
    supported hows — right/outer would need the salt on the other side).

    Cost model: replicates the right side ``buckets``× through the
    shuffle. Worth it when (a) the right side is too big to broadcast,
    (b) the left has hot keys, and (c) ``buckets × |right|`` is still
    far below ``|left|``. Otherwise prefer broadcast or plain AQE.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn("__salt", _row_salt(left, buckets))
    replicated_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(buckets - 1).cast("int"))),
    )
    return salted_left.join(replicated_right, [*keys, "__salt"], how).drop(
        "__salt"
    )


def salted_collect_set(
    df: DataFrame, key: str | list[str], value: str, *, buckets: int = 16
) -> DataFrame:
    """``groupBy(key).agg(collect_set(value))`` in two phases so a hot
    key's set is assembled from ``buckets`` partial sets instead of
    funneling every row through one reduce task.

    Phase 1 groups on (key…, salt) — hot keys fan out across tasks;
    phase 2 merges the ≤``buckets`` partial arrays per key with
    ``flatten`` + ``array_distinct``. Output column: ``{value}_set``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        df.withColumn("__salt", _row_salt(df, buckets))
        .groupBy(*keys, "__salt")
        .agg(F.collect_set(value).alias("__part"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(f"{value}_set"))
    )

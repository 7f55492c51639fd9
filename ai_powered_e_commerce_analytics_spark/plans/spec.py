"""Query-spec plumbing for the correctness registry.

Each spec pairs a Spark implementation (the engine under test) with an
ANSI-SQL oracle DuckDB runs on the same parquet tables. Column names AND
types must agree — the driver sorts columns by name and value-hashes.

Float policy (cross-engine determinism): aggregation of doubles is not
associative, so naive sum/avg can differ between engines in the last
ulps — and rounding does NOT fix it (2-decimal money averages sit
EXACTLY on decimal .5 boundaries, where Spark's and DuckDB's rounding
rules disagree; observed at sf0.01). Policy:

- money columns are exactly 2-decimal -> aggregate in integer CENTS
  (``round(x*100)::BIGINT``): long sums are exact, and
  ``(sum_cents / count) / 100.0`` is a deterministic IEEE expression on
  identical operands -> bit-identical across engines. Emit RAW doubles,
  never round (rounding an exact-decimal rational hits .5 boundaries).
- exact-integer ratios (likeness, jaccard, token stats) -> emit raw;
  bit-identical by construction.
- genuinely float-accumulated values (cosine, L2 norm) -> round(x, 6):
  cross-engine ulp noise is ~1e-14, the 1e-6 grid swamps it, and such
  values are never exactly on a decimal boundary.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    #: DuckDB SQL over the pre-registered views; None -> rows-only check.
    oracle: str | None
    #: Which SURVEY.md §2 operators / north-star ops this covers.
    covers: tuple[str, ...] = field(default=())


def cents(col) -> "Column":  # noqa: F821
    """Exact integer cents of a 2-decimal money column (see float policy)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(expr: str) -> str:
    return f"round({expr} * 100)::BIGINT"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver may hand us a session without our defaults; the
        # events table is TIMESTAMP(NANOS) parquet, unreadable unless
        # nanos are surfaced as long (ns since epoch, µs-precision data).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

#!/usr/bin/env python
"""Dump EXECUTED (final AQE) plans + parquet FileScan counts for named
queries — the round-16 evidence protocol for the exchange-reuse /
cache-substitution fixes. The formatted pre-execution explain shows
AdaptiveSparkPlan isFinalPlan=false, which HIDES whether ReusedExchange
actually fired; only the post-action executedPlan shows the real scan
count (the covariance 4x-scan defect class is invisible before AQE
finalizes). Usage:

    python plans/r16/dump_executed.py <outdir> <suffix> q1,q2,...

Writes <outdir>/<query>_executed_<suffix>.txt and prints one JSON line
{query: {"scans": n, "reused_exchanges": n, "reused_subtrees": n}}.
"""
from __future__ import annotations

import json
import os
import re
import sys


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    from ai_powered_e_commerce_analytics_spark.plans import query_map
    from ai_powered_e_commerce_analytics_spark.plans.quantiles import (
        release_arranged_cache,
    )
    from ai_powered_e_commerce_analytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"dump-executed-{suffix}")
    queries = query_map()
    counts: dict[str, dict[str, int]] = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # InMemoryTableScan nodes hide their build subtree's FileScan in
        # the cached-plan section; count scans in the WHOLE string (the
        # cached relation's plan is printed once under the first
        # InMemoryRelation occurrence).
        scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
        counts[name] = {
            "scans": scans,
            "reused_exchanges": plan.count("ReusedExchange"),
            "inmemory_scans": plan.count("InMemoryTableScan"),
        }
        with open(
            os.path.join(outdir, f"{name}_executed_{suffix}.txt"), "w"
        ) as fh:
            fh.write(plan)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
        release_arranged_cache()
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()

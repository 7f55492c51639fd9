#!/usr/bin/env python
"""Dump the TRUE executing-scan census for named queries — the
round-16 evidence protocol for the exchange-reuse / cache-substitution
fixes. The counting walk lives in
``ai_powered_e_commerce_analytics_spark.plans.probes.executing_scan_census``
(see its docstring for the rules and why text-grepping the executed
plan string over- and under-counts). Usage:

    PYTHONPATH=<tree> python plans/r16/scan_census.py q1,q2,...

Runs each query to the noop sink, prints one JSON line per query.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    names = sys.argv[1].split(",")
    from ai_powered_e_commerce_analytics_spark.plans import query_map
    from ai_powered_e_commerce_analytics_spark.plans.probes import (
        executing_scan_census,
    )
    from ai_powered_e_commerce_analytics_spark.plans.quantiles import (
        release_arranged_cache,
    )
    from ai_powered_e_commerce_analytics_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scan-census")
    queries = query_map()
    for name in names:
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(json.dumps(dict({"query": name}, **executing_scan_census(df))))
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.catalog.clearCache()
        release_arranged_cache()
    spark.stop()


if __name__ == "__main__":
    main()

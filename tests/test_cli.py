"""CLI surface (__main__.py): the medallion chain as subcommands."""

from __future__ import annotations

import argparse

from ai_powered_e_commerce_analytics_spark.__main__ import _run


def _ns(**kw):
    return argparse.Namespace(config=None, llm_base_url=None, **kw)


def test_cli_demo_runs_full_chain(spark, tmp_path):
    base = str(tmp_path / "med")
    out = _run(
        spark,
        _ns(cmd="demo", base=base, pulls=1, rows_per_pull=30),
    )
    assert out["collect"] == {"rows": 30}
    assert out["review"] == {"rows": 30}
    assert out["etl"] == {"rows": 30}
    assert out["date_kpis"] > 0 and out["user_kpis"] > 0


def test_cli_stage_commands_compose(spark, tmp_path):
    base = str(tmp_path / "med2")
    assert _run(
        spark, _ns(cmd="collect", base=base, pulls=1, rows_per_pull=10)
    ) == {"rows": 10}
    assert _run(spark, _ns(cmd="review", base=base)) == {"rows": 10}
    out = _run(spark, _ns(cmd="etl", base=base))
    assert out["rows"] == 10
    # a second review run sees an EMPTY bronze/new (archival moved the
    # consumed batch) — the P5 guard returns 0 instead of re-enriching
    assert _run(spark, _ns(cmd="review", base=base)) == {"rows": 0}


def test_cli_audit_reports_plan_shapes(spark):
    out = _run(
        spark,
        _ns(
            cmd="audit",
            sf_dir="/root/testdata/sf0.001",
            queries="tpch_q1_pricing_summary,part_name_er_pairs",
        ),
    )
    assert out["tpch_q1_pricing_summary"]["pushed_filters"] is True
    assert out["part_name_er_pairs"]["joins"].get("BroadcastHashJoin", 0) >= 1
    assert "error" not in out["tpch_q1_pricing_summary"]


def test_registry_specs_declare_coverage():
    from ai_powered_e_commerce_analytics_spark.plans import QUERIES

    missing = [q.name for q in QUERIES if not q.covers]
    assert not missing, f"specs without covers tags: {missing}"


def test_cli_audit_flags_unpartitioned_windows(spark):
    """The Sort-parented SinglePartition detector: the parity ops'
    global-order windows flag; a global scalar agg (benign final stage
    over partial-agg rows) and a TakeOrderedAndProject top-N do not."""
    out = _run(
        spark,
        _ns(
            cmd="audit",
            sf_dir="/root/testdata/sf0.001",
            queries=(
                "item_id_assignment,pool_assignment,"
                "tokenizer_vocab_coverage,tpch_q6_forecast_revenue,"
                "item_id_assignment_ranged"
            ),
        ),
    )
    assert out["item_id_assignment"]["unpartitioned_window_sorts"] == 1
    assert out["pool_assignment"]["unpartitioned_window_sorts"] == 1
    # top-N via TakeOrderedAndProject — the r7 fix stays fixed
    assert out["tokenizer_vocab_coverage"]["unpartitioned_window_sorts"] == 0
    # global scalar agg: SinglePartition parent is HashAggregate, benign
    assert out["tpch_q6_forecast_revenue"]["unpartitioned_window_sorts"] == 0
    # the documented scale variant of the id assignment really avoids it
    assert out["item_id_assignment_ranged"]["unpartitioned_window_sorts"] == 0

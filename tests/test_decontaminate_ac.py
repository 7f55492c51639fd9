"""Aho-Corasick production path of decontaminate_exact_substring.

The broadcast NL-contains join is O(corpus × |snippets| × len); the
automaton pass is the documented 100 TB swap — one scan of each doc for
ALL snippets. Equality gate: flag-on output == flag-off output == the
registry's DuckDB oracle (VERDICT r7 next-round #4).
"""

from __future__ import annotations

import duckdb
import pytest

from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
    DECONTAMINATE_SUBSTRING_SQL,
    _aho_corasick_build,
    decontaminate_exact_substring,
)
from ai_powered_e_commerce_analytics_spark.schemas import TESTDATA_TABLES

from conftest import SF_DIR


def _ac_scan(text, patterns):
    goto, fail, out = _aho_corasick_build(patterns)
    s, hits = 0, set()
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        hits.update(out[s])
    return {patterns[i] for i in hits}


@pytest.mark.parametrize(
    "text,patterns,want",
    [
        ("abcdef", ["bcd", "cde", "xyz"], {"bcd", "cde"}),
        # overlapping + nested patterns: suffix links must fire "he"
        # inside "she", and "hers" after falling back through "he"
        ("ushers", ["he", "she", "his", "hers"], {"he", "she", "hers"}),
        ("aaaa", ["aa", "aaa"], {"aa", "aaa"}),
        ("", ["a"], set()),
        ("abc", [], set()),
        # pattern equal to whole text; pattern longer than text
        ("abc", ["abc", "abcd"], {"abc"}),
    ],
)
def test_automaton_matches_bruteforce(text, patterns, want):
    assert _ac_scan(text, patterns) == want
    assert {p for p in patterns if p and p in text} == want


def test_flag_on_equals_flag_off_and_oracle(spark, sf_dir):
    via_join = decontaminate_exact_substring(spark, sf_dir)
    via_ac = decontaminate_exact_substring(spark, sf_dir, via_automaton=True)
    jrows = sorted(tuple(r) for r in via_join.collect())
    arows = sorted(tuple(r) for r in via_ac.collect())
    assert via_ac.columns == via_join.columns
    assert arows == jrows and len(jrows) > 0

    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    orows = sorted(
        tuple(r) for r in con.execute(DECONTAMINATE_SUBSTRING_SQL).fetchall()
    )
    con.close()
    assert arows == orows


def test_automaton_plan_is_pure_map(spark, sf_dir):
    # the swap's point: no join, no exchange — one mapInPandas over the
    # corpus scan.
    plan = (
        decontaminate_exact_substring(spark, sf_dir, via_automaton=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan

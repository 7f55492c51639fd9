"""Population Stability Index drift monitor (plans/filtering.py, r12).

The oracle battery pins engine parity; here the STATISTIC is pinned on
planted corpora: identically-distributed sources score ~0 (their only
deviation is the drifted source's own effect on the corpus baseline),
a wholly-shifted source lands in the 'major' band, and the engine's
micro-quantized PSI matches a pure-Python replay."""

from __future__ import annotations

import math

from ai_powered_e_commerce_analytics_spark.plans.filtering import (
    source_length_psi,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _py_psi(rows):
    from collections import Counter

    def bucket(n):
        return len(bin(n)) - 2  # binary digit count

    sb = Counter((s, bucket(n)) for _d, s, n, _t in rows if n > 0)
    ns = Counter(s for (s, _b), c in sb.items() for _ in range(c))
    ns = {}
    cb = {}
    for (s, b), c in sb.items():
        ns[s] = ns.get(s, 0) + c
        cb[b] = cb.get(b, 0) + c
    n_total = sum(cb.values())
    out = {}
    for s in ns:
        micro = 0
        for (s2, b), c in sb.items():
            if s2 != s:
                continue
            p = float(c) / float(ns[s])
            q = float(cb[b]) / float(n_total)
            term = (p - q) * math.log(p / q) * 1_000_000
            micro += int(math.floor(abs(term) + 0.5)) * (1 if term >= 0 else -1)
        out[s] = micro
    return out


def test_psi_separates_drifted_source(spark, tmp_path):
    rows = []
    did = 0
    # sources A and B: identical length profiles (buckets 4..7 evenly)
    for s in ("A", "B"):
        for n in (8, 16, 32, 64) * 5:
            did += 1
            rows.append((did, s, n, "x"))
    # source C: all mass in one far bucket (drifted)
    for _ in range(20):
        did += 1
        rows.append((did, "C", 4096, "x"))
    _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r for r in source_length_psi(spark, str(tmp_path)).collect()
    }
    assert got["C"]["shift_band"] == "major", got["C"]
    assert got["C"]["psi"] > got["A"]["psi"]
    # A and B share one distribution; their PSI is only the baseline
    # contamination from C — identical for both, and far below C's
    assert got["A"]["psi_micro"] == got["B"]["psi_micro"]
    assert got["A"]["shift_band"] in ("stable", "moderate")
    # C is absent from A/B's buckets and vice versa
    assert got["C"]["n_buckets_used"] == 1
    assert got["C"]["n_buckets_excluded"] == 4
    # engine micro values match the pure-Python statistic
    want = _py_psi(rows)
    for s, r in got.items():
        assert r["psi_micro"] == want[s], (s, r["psi_micro"], want[s])

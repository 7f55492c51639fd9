"""Column-blocked SemDeDup witness fold (optimization r16, ADVICE r15).

``_witness_pairs_pdf`` replaced the full |cluster|² dots/cos/mask
materialization with column blocks of B ≈ block_elems/|cluster|.
Contract: identical output to the full-matrix r15 form on any cluster
(the reference below IS that form), for any block size — including
blocks that split mid-cluster — and a LOUD error on zero-norm
embeddings (the NaN-cosine divergence from the old Spark join
predicate must not be silent). Pure driver-side tests: no Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    _witness_pairs_pdf,
)

TAU_LO = 0.3999995


def _reference_full_matrix(pdf: pd.DataFrame, tau_lo: float) -> pd.DataFrame:
    """The r15 full-matrix witness pass, verbatim — the independent
    reference the blocked form must reproduce bit-for-bit."""
    pdf = pdf.sort_values("vec_id", ignore_index=True)
    n = len(pdf)
    if n < 2:
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "dup_of": pd.Series([], dtype="int64")}
        )
    x = np.vstack([np.asarray(r, dtype=np.float64) for r in pdf["emb"]])
    dots = np.zeros((n, n))
    nrm2 = np.zeros(n)
    for d in range(x.shape[1]):
        col = x[:, d]
        dots += np.outer(col, col)
        nrm2 += col * col
    norm = np.sqrt(nrm2)
    cos = dots / np.outer(norm, norm)
    mask = cos >= tau_lo
    mask[np.tril_indices(n)] = False
    hit = mask.any(axis=0)
    first = mask.argmax(axis=0)
    js = np.nonzero(hit)[0]
    ids = pdf["vec_id"].to_numpy()
    return pd.DataFrame({"vec_id": ids[js], "dup_of": ids[first[js]]})


def _cluster(n: int, dim: int = 8, seed: int = 7) -> pd.DataFrame:
    """Synthetic cluster with a fat duplicate tail: base vectors plus
    near-copies so the tau gate fires on a meaningful fraction."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    # make ~1/3 of rows near-duplicates of earlier rows
    for i in range(2, n, 3):
        base[i] = base[i - 2] + rng.normal(scale=1e-3, size=dim)
    # unsorted vec_ids exercise the sort_values normalization
    ids = rng.permutation(n).astype(np.int64) * 7 + 3
    return pd.DataFrame({"vec_id": ids, "emb": [row for row in base]})


@pytest.mark.parametrize("n,block_elems", [
    (5, 4_000_000),    # single block, default sizing
    (40, 1),           # 256-column floor > n: still one block
    (700, 2800),       # B=max(256, 4) -> 256: mid-cluster block splits
    (700, 350_000),    # B=500: split at a different boundary
])
def test_blocked_matches_full_matrix(n, block_elems):
    pdf = _cluster(n)
    got = _witness_pairs_pdf(pdf.copy(), TAU_LO, block_elems=block_elems)
    want = _reference_full_matrix(pdf.copy(), TAU_LO)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert len(want) > 0  # the synthetic dup tail must actually fire


def test_singleton_cluster_empty():
    pdf = _cluster(1)
    out = _witness_pairs_pdf(pdf, TAU_LO)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "dup_of"]


def test_zero_norm_raises_loudly():
    pdf = _cluster(6)
    pdf.at[3, "emb"] = np.zeros(8)
    with pytest.raises(ValueError, match="zero-norm"):
        _witness_pairs_pdf(pdf, TAU_LO)

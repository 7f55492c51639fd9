"""OPQ rotation (VERDICT r11 #2).

The oracle battery (test_queries_oracle.py) pins Spark-vs-DuckDB bit
parity of ``embedding_opq_rotation`` (the unrolled trig-free Jacobi
replay). Here the rotation's SEMANTIC contract is pinned: it is a
genuine orthogonal matrix, the allocation deals every rotated axis to
exactly one (subspace, slot), off-diagonal covariance energy shrinks,
and — the point of OPQ — PQ trained in the rotated space reconstructs
no worse than PQ trained raw, measured through the ENGINE's own
trainer (not a numpy stand-in).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    EMBED_DIM,
    PQ_M,
    PQ_SUBDIM,
    _opq_alloc,
    _opq_jacobi,
    _pq_codes_frame,
    _pq_state_from_sub,
    _sub_split,
    apply_opq_rotation,
    embedding_covariance,
    embedding_opq_rotation,
    embedding_pq_codebook,
    opq_rotation,
)

from conftest import SF_DIR


def test_rotation_is_orthogonal_and_allocation_complete(spark):
    V, alloc = opq_rotation(spark, SF_DIR)
    Vm = np.array(V)
    # orthogonality: a product of Givens rotations, so V^T V = I up to
    # float round-off accumulated over OPQ_JACOBI_ROUNDS rotations
    assert np.abs(Vm.T @ Vm - np.eye(EMBED_DIM)).max() < 1e-12
    # allocation is a bijection axes -> (subspace, slot)
    assert sorted(k for _, _, k in alloc) == list(range(EMBED_DIM))
    assert sorted((s, sl) for s, sl, _ in alloc) == [
        (s, sl) for s in range(PQ_M) for sl in range(PQ_SUBDIM)
    ]
    # the oracle-gated emission agrees with the driver-side values
    rows = embedding_opq_rotation(spark, SF_DIR).collect()
    assert len(rows) == EMBED_DIM * EMBED_DIM
    axis_of = {(s, sl): k for s, sl, k in alloc}
    for r in rows[:200]:
        k = axis_of[(r["subspace"], r["slot"])]
        assert abs(r["w"] - V[r["in_dim"]][k]) < 1e-6


def test_jacobi_reduces_offdiagonal_energy(spark):
    cov_rows = embedding_covariance(spark, SF_DIR).collect()
    A, _ = _opq_jacobi(cov_rows)
    before = sum(
        2 * float(r["cov"]) ** 2 for r in cov_rows if r["i"] != r["j"]
    )
    Am = np.array(A)
    after = (Am**2).sum() - (np.diag(Am) ** 2).sum()
    assert after < before
    # allocation balances captured variance across subspaces: snake
    # dealing keeps every subspace's diagonal budget within 10 % of the
    # mean (contiguous blocks of a sorted spectrum would not)
    alloc = _opq_alloc(A)
    budget = {m: 0.0 for m in range(PQ_M)}
    for s, _sl, k in alloc:
        budget[s] += A[k][k]
    mean = sum(budget.values()) / PQ_M
    assert all(abs(b - mean) / mean < 0.10 for b in budget.values())


def test_rotated_pq_recon_not_worse_than_unrotated(spark):
    """The done-condition of VERDICT r11 #2: train PQ through the
    engine's own exact fixed-point trainer on (a) the raw embeddings
    and (b) the OPQ-rotated embeddings; total reconstruction error
    (exact micro-unit longs) must not increase. Deterministic: every
    input and every training step is exact or fixed-order, so this is
    a fixed fact about the fixture, not a statistical assertion."""
    base_err = (
        embedding_pq_codebook(spark, SF_DIR)
        .agg(F.sum("recon_err_micro"))
        .collect()[0][0]
    )
    sub_r, cents_r = _pq_state_from_sub(
        _sub_split(apply_opq_rotation(spark, SF_DIR))
    )
    rot_err = (
        _pq_codes_frame(sub_r, cents_r)
        .agg(F.sum("recon_err_micro"))
        .collect()[0][0]
    )
    assert rot_err <= base_err, (rot_err, base_err)

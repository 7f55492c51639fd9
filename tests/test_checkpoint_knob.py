"""Reliable-checkpoint knob for the iterative trainers (VERDICT r10 #3).

``functions.core.pin`` defaults to ``localCheckpoint`` (right for
local[n]; lineage severed, unrecoverable after an executor loss) and
switches to a reliable ``checkpoint(dir)`` when the session sets
``spark.graft.checkpointDir`` — the form a long training job needs on
a real cluster. The contract under test: BOTH paths emit identical
results (pinning only changes where the materialized partitions live),
and the reliable path genuinely writes to the configured directory.
"""

from __future__ import annotations

import os

import pytest

from ai_powered_e_commerce_analytics_spark.functions.core import (
    RELIABLE_CHECKPOINT_CONF,
    pin,
)
from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
    bpe_merges_topn,
)
from ai_powered_e_commerce_analytics_spark.plans.textops import (
    dedup_components,
)

from conftest import SF_DIR


def _rdd_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return out


@pytest.fixture
def reliable_dir(spark, tmp_path):
    """Arm the knob for one test and ALWAYS disarm it after — the
    session is shared across the suite and a leaked conf would silently
    flip every later iterative test onto the disk path."""
    d = str(tmp_path / "ckpt")
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, d)
    try:
        yield d
    finally:
        spark.conf.unset(RELIABLE_CHECKPOINT_CONF)


def test_bpe_merges_identical_through_reliable_path(spark, reliable_dir):
    # local-path anchor first, computed WITHOUT the knob (the fixture
    # already armed it, so unset around the anchor run)
    spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    local_rows = sorted(
        tuple(r) for r in bpe_merges_topn(spark, SF_DIR).collect()
    )
    assert local_rows, "anchor run must produce merges"
    assert not _rdd_files(reliable_dir) if os.path.isdir(reliable_dir) else True

    spark.conf.set(RELIABLE_CHECKPOINT_CONF, reliable_dir)
    reliable_rows = sorted(
        tuple(r) for r in bpe_merges_topn(spark, SF_DIR).collect()
    )
    assert reliable_rows == local_rows
    # the reliable path must have actually engaged: checkpoint files
    # exist under the configured directory
    assert _rdd_files(reliable_dir), "no checkpoint files written"


def test_cc_labels_identical_through_reliable_path(spark, reliable_dir):
    spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    local_rows = sorted(
        tuple(r) for r in dedup_components(spark, SF_DIR).collect()
    )
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, reliable_dir)
    reliable_rows = sorted(
        tuple(r) for r in dedup_components(spark, SF_DIR).collect()
    )
    assert reliable_rows == local_rows
    assert _rdd_files(reliable_dir), "no checkpoint files written"


def test_pin_default_is_local(spark):
    # no conf set -> localCheckpoint semantics (no checkpoint dir needed)
    df = pin(spark.range(5))
    assert df.count() == 5


def test_semdedup_identical_through_reliable_path(spark, reliable_dir):
    """r12 (VERDICT r11 #5): semantic_dedup_semdedup's assignment
    materialization was a bare ``localCheckpoint`` — unrecoverable on a
    real cluster during the downstream pair join. Now routed through
    ``pin``: the knob must cover it, results identical."""
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        semantic_dedup_semdedup,
    )

    spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    local_rows = sorted(
        tuple(r) for r in semantic_dedup_semdedup(spark, SF_DIR).collect()
    )
    assert local_rows

    spark.conf.set(RELIABLE_CHECKPOINT_CONF, reliable_dir)
    reliable_rows = sorted(
        tuple(r) for r in semantic_dedup_semdedup(spark, SF_DIR).collect()
    )
    assert reliable_rows == local_rows
    assert _rdd_files(reliable_dir), "no checkpoint files written"


def test_no_bare_localcheckpoint_outside_pin():
    """Every lineage-severing materialization must flow through ``pin``
    so ``spark.graft.checkpointDir`` covers the whole family (VERDICT
    r11 #5). Tokenize the package (comments/strings dropped) and assert
    ``localCheckpoint`` appears in CODE only inside functions/core.py."""
    import io
    import pathlib
    import tokenize

    import ai_powered_e_commerce_analytics_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for py in root.rglob("*.py"):
        if py.relative_to(root).as_posix() == "functions/core.py":
            continue
        code_tokens = [
            tok.string
            for tok in tokenize.generate_tokens(
                io.StringIO(py.read_text()).readline
            )
            if tok.type == tokenize.NAME
        ]
        if "localCheckpoint" in code_tokens:
            offenders.append(str(py))
    assert not offenders, f"bare localCheckpoint in: {offenders}"

"""Reliable-checkpoint knob (operators/ckpt.py, VERDICT r8 item 2):
the prefix-sum scaffold and the BPE merge chain must produce
IDENTICAL results whether their lineage-truncation point is a
localCheckpoint (executor blocks, the local[.] default) or a reliable
checkpoint() to a fault-tolerant dir (the cluster setting) — and the
reliable form must reproduce the same positions when its downstream
plan is re-executed from the checkpoint FILES (the executor-loss
recovery path: nothing below the checkpoint survives to recompute, so
a forced re-run re-reads the files and cannot move rows between
pids)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from database_query_processor_spark.operators import corpus as CP
from database_query_processor_spark.operators.ckpt import checkpoint_frame
from database_query_processor_spark.operators.tokenizer import bpe_learn_merges


def _positions(df) -> list[tuple]:
    return sorted((r["doc_id"], r["pos"]) for r in df.collect())


def test_reliable_true_requires_checkpoint_dir(spark):
    """reliable=True without a context checkpoint dir must fail fast
    with guidance, not as a mid-job SparkException. FIRST in this
    file: reliable=<dir> sets the GLOBAL context checkpoint dir, so
    any sibling test that passes a dir would make this vacuous."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("another test set a global checkpoint dir")
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="setCheckpointDir"):
        CP.train_order(df, "doc_id", num_partitions=4, reliable=True)


def test_train_order_reliable_matches_local(spark, tmp_path):
    """Same positions from the localCheckpoint and reliable-dir paths,
    and the reliable path actually writes checkpoint files."""
    ckdir = str(tmp_path / "ck")
    df = spark.range(700).select(F.col("id").alias("doc_id"))
    local = _positions(CP.train_order(df, "doc_id", num_partitions=8))
    rel = CP.train_order(df, "doc_id", num_partitions=8, reliable=ckdir)
    assert _positions(rel) == local
    files = [
        os.path.join(r, f) for r, _d, fs in os.walk(ckdir) for f in fs
    ]
    assert files, "reliable=dir must materialize checkpoint files"


def test_train_order_reliable_forced_recompute_identical(spark, tmp_path):
    """The join output is NOT persisted, so every action re-executes
    the plan downstream of the checkpoint — i.e. re-reads the
    checkpoint files, exactly what executor-loss recovery does. Two
    independent executions must yield byte-identical positions."""
    ckdir = str(tmp_path / "ck2")
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = CP.train_order(df, "doc_id", num_partitions=8, reliable=ckdir)
    first = _positions(out)
    spark.catalog.clearCache()  # drop any incidental cached blocks
    second = _positions(out)
    assert first == second
    assert sorted(p for _id, p in first) == list(range(1, 1001))


def test_checkpoint_frame_reliable_true_uses_preset_dir(spark, tmp_path):
    """reliable=True picks up a dir set via setCheckpointDir — the
    'configure once, thread the bool' cluster pattern."""
    ckdir = str(tmp_path / "ck3")
    spark.sparkContext.setCheckpointDir(ckdir)
    out = checkpoint_frame(spark.range(50), True)
    assert out.count() == 50
    assert any(fs for _r, _d, fs in os.walk(ckdir)), "files under preset dir"


def test_bpe_chain_reliable_matches_local(spark, tmp_path):
    """The BPE learner's every-k-rounds truncation point must be
    value-invariant across checkpoint flavors."""
    ckdir = str(tmp_path / "ck4")
    docs = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide widen") for i in range(40)],
        ["doc_id", "text"],
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    base = key(bpe_learn_merges(docs, "text", rounds=4, checkpoint_every=1))
    rel = key(
        bpe_learn_merges(
            docs, "text", rounds=4, checkpoint_every=1, reliable=ckdir
        )
    )
    assert rel == base

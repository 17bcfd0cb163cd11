"""Shared lineage-truncation helper with a cluster-reliability knob.

Several iterative / two-pass operators materialize an intermediate
frame so that (a) lineage stays O(1) across rounds and (b) every
downstream read sees the SAME materialization (the prefix-sum
scaffold's pid stamp must be identical for the totals collect and the
final join — a recompute under shuffle-fetch nondeterminism,
SPARK-23207, could silently move rows between pids).

``localCheckpoint`` (the default) stores blocks on the executors:
cheap, no external storage needed, and recompute-proof in the sense
that a lost block FAILS the job loudly instead of recomputing
differently. But on a real cluster those blocks die with their
executor, so a long job holding many scaffold frames becomes fragile.
The cluster answer is reliable ``checkpoint()`` to a fault-tolerant
filesystem (HDFS/S3): blocks are files, executor loss just re-reads
them, and determinism holds because the files ARE the data — no
lineage below the checkpoint survives to be re-run.

``reliable`` accepts:
  * False (default) — ``localCheckpoint(eager=True)``. local[.] and
    short-job behavior, zero external dependencies.
  * True — ``checkpoint(eager=True)`` using the context's already-set
    checkpoint dir (``SparkContext.setCheckpointDir``); raises
    ValueError with guidance if none is set, rather than letting
    Spark throw a bare SparkException mid-job.
  * a str path — sets the context checkpoint dir to it, then reliable
    ``checkpoint(eager=True)``. Note ``setCheckpointDir`` is GLOBAL
    to the SparkContext: passing a dir re-points every subsequent
    reliable checkpoint in the process, which is almost always what a
    batch job wants (one durable scratch root).

Values are never affected by the knob — only where the materialized
bytes live and what executor loss does (local: loud job failure;
reliable: transparent re-read)."""

from __future__ import annotations

from pyspark.sql import DataFrame

Reliable = bool | str


def checkpoint_frame(df: DataFrame, reliable: Reliable = False) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — locally by
    default, or onto a fault-tolerant checkpoint dir (see module
    docstring for the knob's contract)."""
    if not reliable:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if isinstance(reliable, str):
        sc.setCheckpointDir(reliable)
    elif sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable=True needs a checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir('<fault-tolerant path>') "
            "first, or pass the dir itself as reliable='<path>'"
        )
    return df.checkpoint(eager=True)

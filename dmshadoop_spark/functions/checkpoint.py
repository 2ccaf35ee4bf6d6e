"""Lineage stabilization with an operable reliability switch (round-8
verdict task 5).

Every iterative operator in this repo (connected components, PageRank,
logistic-regression training, the bigram-LM model table, the JL+SQ8
candidate index) must truncate lineage between rounds — without it each
round RE-EXECUTES the caller's whole upstream plan (the round-7 sf1
probe measured x35's 24-second pair subtree re-run ~10 times).

Two ways to truncate, one trade:

  * ``localCheckpoint`` — blocks live on executor local storage. No
    distributed-FS round-trip (strictly better in local mode and for
    bounded test SFs), but losing an executor mid-run makes the job
    unrecoverable.
  * reliable ``checkpoint`` — blocks go to ``spark.sparkContext``'s
    checkpoint dir (HDFS/object store on a cluster). Survives executor
    loss; costs a write+read of the checkpointed data.

Until round 9 the trade lived in docstrings ("a cluster run should set a
checkpoint dir and use reliable .checkpoint()") with no code path that
actually switched. ``stabilize`` IS that switch: call
``sc.setCheckpointDir(...)`` once per session (the standard Spark knob —
no new config invented) and every stabilization site in the repo
upgrades to the reliable form; leave it unset and the executor-local
fast path is used. Results are identical either way — both forms
materialize the same rows; only the storage (and recoverability) of the
truncation point differs.

Disk lifecycle on the reliable path: checkpoint files are NOT deleted
by default when the RDD goes out of scope, and the iterative loops here
write one per round (connected components: up to ~27 per call). Set
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` alongside the
dir — deploy.YARN_CONF ships it — so files are reclaimed as each
round's RDD is GC'd; otherwise budget the dir for (rounds × dataset)
copies per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stabilize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` when the
    session has a checkpoint dir set (``sc.setCheckpointDir``), else
    ``localCheckpoint()``. Same rows either way — the switch picks
    where the materialized blocks live (recoverable storage vs executor
    memory/disk)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

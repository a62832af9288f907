"""Reliable materialization seam.

Every iterative operator and model-table materialization in this
package needs to cut lineage and pin a small intermediate result:
graph fixpoint loops (:mod:`operators.graph`), the LM broadcast-gate
model tables (:mod:`operators.lm`), SemDeDup's slim assignment
(:mod:`operators.similarity`), the Block-Max posting slice
(:mod:`operators.index`), the BPE merge loop, the cuckoo kick rounds,
and the slim-output checkpoints in :mod:`operators.text_dedup`.

``DataFrame.localCheckpoint`` is the cheap way to do that — but it
stores blocks ONLY on executors with no lineage left to recompute
them, so on a real cluster the loss of a single executor mid-job makes
the truncated RDD unrecoverable and fails the job (Spark's documented
behavior for local checkpoints). At this engine's design point — a
10^10-edge PageRank on 1000 executors running for an hour — executor
loss is near-certain, so local checkpoints are only acceptable in
single-JVM sandboxes.

:func:`materialize` is the one seam all call sites route through:

- when the SparkContext has a **checkpoint directory** configured
  (``sc.setCheckpointDir("hdfs://...")`` — the normal cluster setup),
  it uses reliable ``DataFrame.checkpoint``: blocks are written to the
  fault-tolerant store and survive executor loss. Pair it with
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` so
  reference-collected checkpoints are deleted from the store.
- otherwise (the sandbox / ``local[*]`` case) it falls back to
  ``localCheckpoint`` — same semantics, no extra I/O, acceptable
  because a single-JVM "cluster" cannot lose an executor without
  losing the job anyway.

Both modes return a DataFrame with identical rows and schema; the only
difference is where the blocks live (``tests/test_materialize.py``
pins result-identity across modes). Call sites keep the chained style
via ``df.transform(materialize)`` /
``df.transform(materialize, eager=False)``.

Lifecycle note (applies to both modes): materialization is permanent
for the life of the DataFrame object — blocks are freed when the
Python object is garbage-collected (non-eager local checkpoints also
free on unpersist). Long-lived sessions that build many scorers should
drop references to released models; see ``operators/lm.py``'s
retention note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_dir_configured(df: DataFrame) -> bool:
    """True when the owning SparkContext has a reliable checkpoint
    directory set (``sc.setCheckpointDir``)."""
    sc = df.sparkSession.sparkContext
    try:
        return sc.getCheckpointDir() is not None
    except Exception:  # pragma: no cover - very old JVM bridge shapes
        return False


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage and pin ``df``, surviving executor loss on clusters.

    Uses reliable ``checkpoint`` when a checkpoint dir is configured,
    else ``localCheckpoint``. ``eager=True`` (default, matching
    ``localCheckpoint``'s default) triggers the job immediately;
    ``eager=False`` defers materialization to the first action.
    """
    if checkpoint_dir_configured(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

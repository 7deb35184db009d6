"""Bounded-lifetime ``localCheckpoint`` bookkeeping.

``localCheckpoint`` stores partitions in executor block storage, and
PySpark exposes no handle to release them; an iterative fixpoint that
checkpoints per round therefore pins EVERY round's labels/ranks table
until the session dies. Two measured costs (r15 optimization round):

- session pollution: a long-lived session that runs many
  checkpoint-heavy builds (the 168-row bench, the driver's window)
  accumulates hundreds of dead generations — storage competes with
  execution memory in the unified manager, and a later query's
  sort/aggregate warm time tripled (icws: 4.1 s fresh session vs
  12.9 s after four REBUILD rows had run first);
- scale: a 25-round fixpoint at 100 TB would hold 25 corpus-sized
  label tables in executor memory for no reason — only the newest
  generation is ever read again.

These helpers diff the SparkContext persistent-RDD registry so a loop
can drop exactly the generations it has PROVEN dead. A dropped
localCheckpoint cannot be recomputed (its lineage is truncated), so
only ids whose data no live DataFrame references may be passed to
:func:`unpersist_ids` — in practice: generation r-1 after generation r
has materialized from it, and build-time scaffolding once the returned
plan no longer references it. The id-diff protocol assumes the loop
runs single-threaded on the driver (true of every fixpoint here; the
concurrent PQ subspace fits do not use it).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids currently registered in the context's persistent-RDD map
    (localCheckpoint marks register at DataFrame creation, cached
    plans at materialization)."""
    jsc = spark.sparkContext._jsc
    return {int(x) for x in jsc.getPersistentRDDs().keySet().toArray()}


def unpersist_ids(spark: SparkSession, ids: set[int]) -> None:
    """Non-blocking unpersist of the given registry ids (missing ids
    are ignored — another cleanup may have raced us between rows)."""
    if not ids:
        return
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        r = m.get(rid)
        if r is not None:
            r.unpersist(False)

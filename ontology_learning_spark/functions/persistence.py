"""Eager materialization with a fault-tolerance-aware strategy.

``localCheckpoint(eager=True)`` truncates lineage: the blocks live only
in executor memory/disk, so losing an executor makes every downstream
stage unrecoverable (cached data would be recomputed from lineage;
locally-checkpointed data cannot be). That trade is fine in single-JVM
local mode — there is no partial executor loss to survive — and it is
the fastest way to pin a subtree that several concurrent consumer
stages would otherwise race-recompute (see plans/pipeline.py).

On a cluster (non-local master) the default flips to a replicated
persist + eager count: lineage is kept (lost blocks are recomputable)
and blocks are 2x-replicated so a single executor loss usually doesn't
even trigger a recompute. Callers can force either strategy with
``reliable=``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Eagerly materialize ``df`` so concurrent consumers never
    recompute its subtree. See module docstring for the strategy."""
    if reliable is None:
        master = df.sparkSession.sparkContext.master or ""
        reliable = not master.startswith("local")
    if not reliable:
        return df.localCheckpoint(eager=True)
    out = df.persist(StorageLevel.MEMORY_AND_DISK_2)
    out.count()
    return out

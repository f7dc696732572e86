"""Change-data-capture application: upsert/delete batches onto a
keyed snapshot.

The incremental-maintenance primitive a living corpus needs (the
reference rebuilds tables from scratch each run; a 100 TB corpus cannot):
given the current snapshot and a batch of changes — new rows, updated
rows, tombstones — produce the next snapshot by keeping the LATEST
version of every key and dropping deleted keys.

Spark-first shape: union the sides and take the per-key max-version row
with ``max_by`` over a single grouped aggregation — one shuffle on the
key, map-side partial combine, no window sort. Ties on version resolve
to the change side (``_src`` priority), matching "the batch you just
applied wins" merge semantics.

At 100 TB the snapshot lives partitioned/bucketed by the key; the
change batch is typically small — AQE broadcasts it into the join-free
grouped pass, and the rewrite touches only the partitions holding
changed keys when composed with dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Next snapshot = latest version per key, tombstones dropped.

    ``snapshot`` and ``changes`` must share a schema (``changes`` may
    add ``tombstone_col``; the snapshot is assumed live). Within one
    input, (key, version) must be unique — two changes to a key in one
    batch need distinct versions, or the survivor is undefined upstream
    of this operator and it refuses to guess (standard CDC contracts
    sequence intra-batch changes).
    """
    data_cols = [c for c in snapshot.columns if c not in keys]
    if tombstone_col is None:
        tombstone_col = "_deleted"
        changes = changes.withColumn(tombstone_col, F.lit(False))
    snap = snapshot.withColumn(tombstone_col, F.lit(False)).withColumn(
        "_src", F.lit(0)
    )
    chg = changes.select(*snapshot.columns, tombstone_col).withColumn(
        "_src", F.lit(1)
    )
    packed = F.struct(
        F.col(version_col),
        F.col("_src"),
        *[F.col(c) for c in data_cols if c != version_col],
        F.col(tombstone_col),
    )
    latest = (
        snap.unionByName(chg)
        .groupBy(*keys)
        .agg(
            F.max_by(
                packed,
                F.struct(F.col(version_col), F.col("_src")),
            ).alias("_w")
        )
    )
    return latest.filter(~F.col(f"_w.{tombstone_col}")).select(
        *keys, *[F.col(f"_w.{c}").alias(c) for c in data_cols]
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    order_cols: list[str] | None = None,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log.

    Each change row becomes a VERSION with a validity interval:
    ``valid_from`` = its own version value, ``valid_to`` = the NEXT
    change's version for the same key (NULL while current), and
    ``is_current`` marking the open interval. If ``tombstone_col`` is
    given, deletes CLOSE the preceding interval (their version becomes
    its ``valid_to``) but emit no row of their own — a key whose last
    change is a delete has no current version, exactly the Kimball SCD2
    contract warehouses build from CDC feeds.

    One shuffle: the per-key ``lead`` window on (version, tie-breakers).
    At 100 TB this is a sort within key partitions — the same shape as
    sessionization, no driver state. ``order_cols`` break version ties
    deterministically (pass the change's unique id).
    """
    order = [F.col(version_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    hist = changes.withColumn(
        "_valid_to", F.lead(version_col).over(w)
    ).withColumn("is_current", F.col("_valid_to").isNull())
    if tombstone_col is not None:
        hist = hist.filter(~F.col(tombstone_col)).drop(tombstone_col)
    return hist.withColumnRenamed(version_col, "valid_from").withColumnRenamed(
        "_valid_to", "valid_to"
    )

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


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_set: dict[str, "F.Column"] | None = None,
    delete_when: "F.Column | None" = None,
    insert_values: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Delta-style MERGE INTO as one declarative plan: returns the next
    snapshot of ``target`` after applying ``source`` row-by-key —

    - matched & ``delete_when`` → row dropped;
    - matched otherwise → ``update_set`` columns replaced, other
      columns kept;
    - source-only keys → inserted via ``insert_values`` (omit to ignore
      unmatched source rows — WHEN NOT MATCHED THEN do nothing);
    - target-only keys → pass through unchanged.

    Clause expressions reference the two sides by DataFrame alias —
    ``F.col("t.<col>")`` for target, ``F.col("s.<col>")`` for source —
    the Delta MERGE naming, resolved by Spark's alias qualifiers.

    Spark shape: ONE full-outer equi join on the keys (AQE broadcasts a
    small source), every clause a codegen CASE — no driver state, no
    window. The SQL-standard/Delta ambiguity guard is enforced IN-PLAN:
    a source carrying duplicate keys would apply two updates to one
    target row nondeterministically, so each source row carries its
    per-key count (one partial-agg pass) and the plan raises on
    count > 1 — the job fails loudly instead of merging garbage, the
    same fail-inside-the-job contract as pagerank's decimal guard.

    At 100 TB: snapshot partitioned by key + dynamic partition
    overwrite → only partitions holding changed keys rewrite; the merge
    itself is the one key-shuffle (or zero with a broadcastable batch).
    """
    upd = update_set or {}
    t_cols = target.columns
    for c in keys:
        if c in upd:
            raise ValueError(f"update_set may not rewrite merge key {c!r}")
    bad = [c for c in upd if c not in t_cols]
    if bad:
        raise ValueError(f"update_set targets unknown columns: {bad}")
    if insert_values is not None:
        missing = [
            c for c in t_cols if c not in keys and c not in insert_values
        ]
        if missing:
            raise ValueError(
                f"insert_values must cover every non-key target column; "
                f"missing: {missing}"
            )

    # Per-key source count via a WINDOW (not agg + name-equi re-join:
    # plain equality would drop NULL-keyed source rows that the
    # null-safe merge join below legitimately matches).
    s_cnt = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    # Explicit presence markers, NOT key-null tests: the join condition
    # is null-safe, so a NULL key value can legitimately match — only a
    # marker distinguishes "side absent" from "side present with NULL".
    s = source.withColumn("_s_cnt", s_cnt).withColumn(
        "_s_present", F.lit(True)
    ).alias("s")
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    cond = [
        F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}")) for c in keys
    ]
    j = t.join(s, cond, "full_outer")
    t_here = F.col("_t_present").isNotNull()
    s_here = F.col("_s_present").isNotNull()
    matched = t_here & s_here
    s_only = ~t_here & s_here
    guard = F.when(
        F.col("_s_cnt") > 1,
        F.raise_error(
            F.format_string(
                "merge_into: %s source rows share one key — merge is "
                "ambiguous (sequence intra-batch changes first)",
                F.col("_s_cnt").cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.lit(1))

    keep = F.lit(True)
    if delete_when is not None:
        keep = ~(matched & F.coalesce(delete_when, F.lit(False)))
    if insert_values is None:
        keep = keep & ~s_only

    out_cols = []
    for c in t_cols:
        if c in keys:
            val = F.when(s_only, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            val = F.col(f"t.{c}")
            if c in upd:
                val = F.when(matched, upd[c]).otherwise(val)
            if insert_values is not None:
                val = F.when(s_only, insert_values[c]).otherwise(val)
        out_cols.append(val.alias(c))
    # The guard is the LEFT conjunct so codegen evaluates it for EVERY
    # joined row before `keep` can short-circuit: with it on the right,
    # a key whose duplicate source rows all resolve to row-drop (all
    # matched duplicates satisfy delete_when, or source-only duplicates
    # with insert_values=None) would never raise, silently violating
    # the documented count>1 contract. Conjunct order inside one Filter
    # is preserved (And evaluates left-to-right), and neither conjunct
    # can be pushed below the FULL OUTER join, so left-position
    # evaluation is reliable. (coalesce: target-only rows carry a NULL
    # _s_cnt and are never ambiguous.)
    return j.filter((F.coalesce(guard, F.lit(1)) == 1) & keep).select(
        *out_cols
    )

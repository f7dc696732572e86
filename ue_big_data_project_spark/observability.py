"""Pipeline observability: metrics that ride the job, and expectation
gates that split bad records out instead of failing the run.

At 100 TB you cannot afford a second scan to know what a pipeline did —
row counts, null rates, and domain violations must be accumulated BY the
job that does the work. ``observe`` attaches named aggregate metrics to
a plan (computed during the existing pass, exchanged as a few scalars);
for streams the same metrics surface per micro-batch through the query
progress events. Expectations split a batch into (passing, quarantined)
with the violated rule names attached — the dead-letter pattern — so one
malformed crawl shard quarantines instead of poisoning the corpus or
killing a 10-hour job.
"""

from __future__ import annotations

import json
from collections.abc import Mapping

from ue_big_data_project_spark import fs

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ue_big_data_project_spark.session import local_relation
from pyspark.sql.streaming import StreamingQueryListener


def quality_metrics(
    df: DataFrame, columns: list[str] | None = None
) -> dict[str, Column]:
    """The standard ingest health metrics for ``df``: total rows plus a
    null count per column (default: every column). Feed to
    :func:`observed` / :func:`drain_with_metrics`."""
    cols = columns or df.columns
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        out[f"null_{c}"] = F.count_if(F.col(c).isNull())
    return out


def observed(
    df: DataFrame, metrics: Mapping[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named metrics to a BATCH plan; they are computed by the
    same pass that executes the plan (no extra scan, no extra job).

    Returns ``(df, observation)`` — run any action on the returned
    DataFrame, then read ``observation.get``.
    """
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs


def observed_stream(
    sdf: DataFrame, name: str, metrics: Mapping[str, Column]
) -> DataFrame:
    """Attach named metrics to a STREAMING plan under ``name``; each
    micro-batch reports them through its progress event (collect with
    :class:`MetricsListener` or :func:`drain_with_metrics`)."""
    named = [c.alias(n) for n, c in metrics.items()]
    return sdf.observe(name, *named)


class MetricsListener(StreamingQueryListener):
    """Collects per-micro-batch observed metrics from progress events.

    ``listener.metrics`` maps observation name → list of per-batch dicts
    (batch order preserved). Register via
    ``spark.streams.addListener(listener)``; remove when done.
    """

    def __init__(self) -> None:
        self.metrics: dict[str, list[dict]] = {}

    def onQueryStarted(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryProgress(self, event) -> None:
        # The progress payload is JSON on the Python side; observedMetrics
        # holds one row-shaped dict per observation name.
        progress = json.loads(event.progress.json)
        for name, row in (progress.get("observedMetrics") or {}).items():
            self.metrics.setdefault(name, []).append(dict(row))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - no-op
        pass


def drain_with_metrics(
    spark: SparkSession,
    sdf: DataFrame,
    metrics: Mapping[str, Column],
    mode: str = "append",
) -> tuple[DataFrame, list[dict]]:
    """Drain a bounded stream with metrics attached; return the final
    batch result AND the per-micro-batch metric dicts — the streaming
    counterpart of :func:`observed`.

    Metrics are read synchronously from the query's own progress history
    before it stops (listener events are delivered on a separate thread,
    so a drain-then-read via :class:`MetricsListener` would race; the
    listener is for long-running queries, this is for bounded drains).
    """
    import tempfile
    import uuid

    name = f"metrics_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
    q = (
        observed_stream(sdf, "gate", metrics)
        .writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        batches = []
        for p in q.recentProgress:
            progress = json.loads(p.json) if hasattr(p, "json") else p
            row = (progress.get("observedMetrics") or {}).get("gate")
            if row is not None:
                batches.append(dict(row))
        # Detach the result from the memory sink so both the sink table
        # and the checkpoint can be dropped — otherwise every drain in a
        # long-lived session leaks a registered table holding the full
        # batch result plus an orphan checkpoint dir.
        result = spark.table(name).localCheckpoint(eager=True)
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
        fs.rmtree(ckpt)
    return result, batches


def split_by_expectations(
    df: DataFrame, expectations: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: ``(passing, quarantined)`` by named rules.

    Each expectation is a boolean Column that good rows satisfy; a null
    verdict counts as a violation (null-hostile by design — an
    unevaluable rule must not wave records through). Quarantined rows
    carry ``_violations`` (array of failed rule names) for triage; the
    passing side is returned unchanged. One pass, no shuffle: the rule
    evaluation is a projection, the split is two filters on it that
    Catalyst merges into the parent scan.

    A pre-existing ``_violations`` column is rejected rather than
    silently overwritten: re-gating a quarantine table must not destroy
    its violation history — drop or rename the old column explicitly.
    """
    if "_violations" in df.columns:
        raise ValueError(
            "input already has a _violations column (a prior quarantine?); "
            "drop or rename it before re-gating"
        )
    flags = F.array(
        *[
            F.when(~cond.eqNullSafe(F.lit(True)), F.lit(name))
            for name, cond in expectations.items()
        ]
    )
    tagged = df.withColumn(
        "_violations", F.filter(flags, lambda x: x.isNotNull())
    )
    good = tagged.filter(F.size("_violations") == 0).drop("_violations")
    bad = tagged.filter(F.size("_violations") > 0)
    return good, bad


class Constraint:
    """A named table-level data-quality constraint: one aggregate
    observation (a double) checked against optional [lo, hi] bounds —
    the Deequ ``VerificationSuite`` shape. Build instances with the
    ``c_*`` constructors below; evaluate a suite with
    :func:`check_constraints`."""

    __slots__ = ("name", "observe", "lo", "hi")

    def __init__(
        self,
        name: str,
        observe: Column,
        lo: float | None = None,
        hi: float | None = None,
    ) -> None:
        self.name = name
        self.observe = observe
        self.lo = lo
        self.hi = hi


def _ratio(num: Column) -> Column:
    """num / total rows as double — exact integer counts divided once,
    so the ratio is bit-identical in any engine."""
    return num.cast("double") / F.count(F.lit(1)).cast("double")


def c_row_count(
    lo: float | None = None, hi: float | None = None, name: str = "row_count"
) -> Constraint:
    return Constraint(name, F.count(F.lit(1)).cast("double"), lo, hi)


def c_completeness(col: str, lo: float = 1.0) -> Constraint:
    """Fraction of rows with ``col`` non-null."""
    return Constraint(
        f"completeness({col})",
        _ratio(F.count_if(F.col(col).isNotNull())),
        lo,
        None,
    )


def c_distinct_ratio(col: str, lo: float = 1.0) -> Constraint:
    """Exact distinct values / rows — 1.0 means the column is unique.
    (Named for what it measures; Deequ's 'uniqueness' divides values
    occurring exactly once instead.)"""
    return Constraint(
        f"distinct_ratio({col})", _ratio(F.countDistinct(F.col(col))), lo, None
    )


def c_min(col: str, lo: float) -> Constraint:
    return Constraint(f"min({col})", F.min(F.col(col)).cast("double"), lo, None)


def c_max(col: str, hi: float) -> Constraint:
    return Constraint(
        f"max({col})", F.max(F.col(col)).cast("double"), None, hi
    )


def c_mean(col: str, lo: float | None, hi: float | None) -> Constraint:
    """Mean of a numeric column via DECIMAL-exact sum (float addition
    is partition-order-dependent; the decimal sum is associative), cast
    back to double, divided once, rounded at 6 dp."""
    from ue_big_data_project_spark.functions import pround

    return Constraint(
        f"mean({col})",
        pround(
            F.sum(F.col(col).cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ),
        lo,
        hi,
    )


def c_in_set(col: str, allowed: list, lo: float = 1.0) -> Constraint:
    """Fraction of rows whose value is in ``allowed``."""
    return Constraint(
        f"in_set({col})",
        _ratio(F.count_if(F.col(col).isin(list(allowed)))),
        lo,
        None,
    )


def c_matches(col: str, pattern: str, lo: float = 1.0) -> Constraint:
    """Fraction of rows matching an anchored regex. Keep patterns in
    the POSIX-common subset — the check must mean the same thing to
    Java regex (Spark) and RE2-style engines (oracle portability)."""
    return Constraint(
        f"matches({col})",
        _ratio(F.count_if(F.col(col).rlike(pattern))),
        lo,
        None,
    )


def check_constraints(
    df: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Evaluate a constraint suite in ONE pass over ``df``:
    ``(constraint, observed, passed)``, one row per constraint in
    suite order.

    All observations compute side by side in a single aggregate (each
    is partial-aggregating, so the shuffle carries one scalar per
    constraint — except exact distincts, which Spark plans via Expand;
    swap those for ``approx_count_distinct`` bounds at the
    :func:`profile_columns` scale the way that docstring describes).
    The scalar row then unpivots through a literal stack and the
    bounds ride a broadcast literal table — no second scan, no
    per-constraint jobs, which is the entire point at 100 TB: the
    verification costs what one aggregation of the ingest already
    costs.

    A NULL observation (min/mean of an empty table) FAILS its
    constraint — an unevaluable check must not wave a drop through
    (the :func:`split_by_expectations` null-hostility, table-level).
    Row-level dead-lettering is that function's job; this one renders
    the table-level verdict a pipeline gates a source drop on.
    """
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names in suite: {names}")
    row = df.agg(
        *[c.observe.alias(f"_o{i}") for i, c in enumerate(constraints)]
    )
    pairs: list[Column] = []
    for i, c in enumerate(constraints):
        pairs += [F.lit(c.name), F.col(f"_o{i}")]
    long = row.select(
        F.stack(F.lit(len(constraints)), *pairs).alias(
            "constraint", "observed"
        )
    )
    bounds = local_relation(
        df.sparkSession,
        [(c.name, c.lo, c.hi) for c in constraints],
        "constraint string, _lo double, _hi double",
    )
    return (
        long.join(F.broadcast(bounds), "constraint")
        .select(
            "constraint",
            "observed",
            (
                F.col("observed").isNotNull()
                & (F.col("_lo").isNull() | (F.col("observed") >= F.col("_lo")))
                & (F.col("_hi").isNull() | (F.col("observed") <= F.col("_hi")))
            ).alias("passed"),
        )
    )


def executed_scan_metrics(df: DataFrame) -> dict[str, int]:
    """Run ``df`` and return the summed SQLMetric values of its leaf
    scan nodes (``numFiles``, ``numOutputRows``, ``filesSize``, ...).

    The I/O-side complement of :func:`observed`: after the action, the
    executed plan's FileSourceScan metrics say how much the scan
    actually LISTED and READ — the observable that data-skipping layouts
    (``sources.write_range_sorted`` / ``write_zordered`` /
    ``read_stat_pruned``, IVF cell partitioning) exist to shrink, and
    the number to alert on when a pruned pipeline silently regresses to
    full scans. Executes the plan JVM-side (an RDD count over the
    executed plan) — no rows reach the driver, so it is safe on
    production-sized inputs.
    """
    plan = df._jdf.queryExecution().executedPlan()
    plan.execute().count()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    out: dict[str, int] = {}
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = out.get(kv._1(), 0) + kv._2().value()
    return out


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """One-pass table profile: per column, the row count, null count,
    distinct count, and (numeric columns) min/max as doubles —
    the pre-ingest audit a 100 TB pipeline runs before trusting a new
    source drop.

    One scan computes every column's aggregates side by side (count /
    count_if / count_distinct are all partial-aggregating, so the
    shuffle carries a handful of scalars per column), then the scalar
    row unpivots to one row per column via a literal stack — no second
    pass, no per-column jobs. Non-numeric columns report null min/max
    (rendering min/max of strings/timestamps portably is a formatting
    contract, not a profiling one).

    ``approx_distinct=True`` swaps the exact ``count_distinct`` for the
    JVM-side HLL++ ``approx_count_distinct`` (rsd 2%). This is the
    at-scale switch: k exact distincts in one aggregate force an
    Expand — the scan re-emits every row k times and each distinct
    shuffles its full value set — while the HLL sketches partial-
    aggregate flat (plan pinned by tests). The estimate is NOT
    cross-engine deterministic, so the oracle-paired ``pipeline_profile``
    query keeps the exact form; the approx profile is an audit tool,
    like the portable-sketch operators but engine-internal.
    """
    from pyspark.sql import types as T

    cols = columns or df.columns
    numeric = {
        c
        for c in cols
        if isinstance(df.schema[c].dataType, T.NumericType)
    }
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count_if(F.col(c).isNull()).alias(f"__null_{c}"),
            (
                F.approx_count_distinct(F.col(c), rsd=0.02)
                if approx_distinct
                else F.countDistinct(F.col(c))
            ).alias(f"__dist_{c}"),
            (
                F.min(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__min_{c}"),
            (
                F.max(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_num"),
                F.col(f"__max_{c}").alias("max_num"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")

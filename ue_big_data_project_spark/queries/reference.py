"""The reference's four declared queries + the wind pipeline, re-expressed
as composable, source-agnostic DataFrame functions.

Each function takes already-parsed DataFrames (batch OR streaming — the
ingestion edge is ``sources``/``streaming``) and returns a DataFrame, so
the same logic is unit-testable on fixtures, replayable from files, or
attachable to Kafka. Reference bugs (SURVEY §2.11) are fixed to intended
semantics and noted inline.

Queries (reference README.md:5-13):
  Q1 batch  — min wait between each plane arrival and the next city bus
  Q2 batch  — bus traffic per hour of day at a stop
  Q3 stream — live estimated positions of buses on a line
  Q4 stream — bike-station occupancy (5 nearest shelters)
  wind      — streaming dedup + tumbling-window average (previous lab)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ue_big_data_project_spark.functions import (
    digits_only,
    epoch_to_ts,
    french_time,
    hour_bucket,
    hour_norm,
    minutes_between,
    occupancy_bar,
    parse_wait_minutes,
)
from ue_big_data_project_spark.operators.asof import asof_join
from ue_big_data_project_spark.streaming import windowed_agg


# ---------------------------------------------------------------------------
# Q1 — plane → next bus wait (src/plane_naolib_consumer.py)
# ---------------------------------------------------------------------------
def expand_bus_schedule(bus_df: DataFrame, service_date: str) -> Column:
    """Bus schedule (bus, heure "4h".."25h", passages ["50d","12",...]) →
    one row per departure with a ``bus_time`` timestamp.

    Mirrors process_bus_data (src/plane_naolib_consumer.py:77-89) but the
    service date is a parameter, not a hard-coded literal (§2.11 bug 5),
    and hour normalization handles the 24h/25h after-midnight encoding.
    """
    return (
        bus_df.select(
            "bus", "heure", F.explode("passages").alias("passage")
        )
        .withColumn("dep_hour", hour_norm("heure"))
        .withColumn("dep_minute", digits_only("passage"))
        .filter(F.col("dep_hour").isNotNull() & F.col("dep_minute").isNotNull())
        .withColumn(
            "bus_time",
            F.to_timestamp(
                F.concat(
                    F.lit(service_date),
                    F.lit(" "),
                    F.col("dep_hour").cast("string"),
                    F.lit(":"),
                    F.lpad(F.col("dep_minute").cast("string"), 2, "0"),
                    F.lit(":00"),
                )
            ),
        )
        .select("bus", "bus_time")
    )


def q1_plane_bus_wait(
    plane_df: DataFrame,
    bus_df: DataFrame,
    begin_epoch: int,
    end_epoch: int,
    service_date: str,
    strategy: str = "broadcast_rank",
) -> DataFrame:
    """Minimum wait between each plane arrival and the next city-bound bus.

    Reference shape: theta join ``bus_time > arrival_time`` + window
    rank 1 (src/plane_naolib_consumer.py:91-105). ``strategy`` picks the
    as-of physical plan (``broadcast_rank`` = reference parity; the
    schedule side is tiny so broadcast is the right call at any scale).
    Epoch range and service date are parameters (§2.11 bug 5).
    """
    planes = (
        plane_df.withColumn("arrival_time", epoch_to_ts("lastSeen"))
        .filter(F.col("lastSeen").between(begin_epoch, end_epoch))
        .select("icao24", "callsign", "arrival_time")
    )
    buses = expand_bus_schedule(bus_df, service_date)
    out = asof_join(
        planes,
        buses,
        left_ts="arrival_time",
        right_ts="bus_time",
        left_keys=["icao24", "callsign"],
        right_cols=["bus", "bus_time"],
        strategy=strategy,
        strict=True,
    )
    return out.select(
        "icao24",
        "callsign",
        "arrival_time",
        F.col("asof.bus").alias("bus"),
        F.col("asof.bus_time").alias("bus_time"),
        minutes_between(F.col("asof.bus_time"), F.col("arrival_time")).alias(
            "wait_minutes"
        ),
        french_time(F.col("arrival_time")).alias("arrival_display"),
        F.concat(
            minutes_between(F.col("asof.bus_time"), F.col("arrival_time")).cast(
                "string"
            ),
            F.lit("m"),
        ).alias("wait_display"),
    )


# ---------------------------------------------------------------------------
# Q2 — bus affluence per hour (batch_bus_affluence.ipynb)
# ---------------------------------------------------------------------------
def q2_affluence_per_hour(
    affluence_df: DataFrame,
    stop: str | None = None,
    line: str | None = None,
) -> DataFrame:
    """Bus count per hour-of-day at a stop.

    One count per passage row — the *intended* semantics of
    parse_time_udf; the reference UDF iterated the characters of the
    passage string, double-counting "22" (§2.11 bug 1; the pure-Python
    variant in cell 2 has the correct per-message count). Hour
    normalization (`"25h"` → `"01:00"`) is a native expression, no UDF
    (U3 rewrite, SURVEY §2.10).
    """
    df = affluence_df
    if stop is not None:
        df = df.filter(F.col("stop") == stop)
    if line is not None:
        df = df.filter(F.col("numLigne") == line)
    return (
        df.select(hour_bucket("heure").alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("bus_count"))
        .orderBy("hour")
    )


# ---------------------------------------------------------------------------
# Q3 — live bus positions on an ordered line (src/naolib_consumer.py)
# ---------------------------------------------------------------------------
POSITION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("location", T.StringType(), False),
            T.StructField("status", T.BooleanType(), False),
        ]
    )
)


def detect_positions_expr(
    stops_col: Column, sens_col: Column, ordered_stops: list[str]
) -> Column:
    """U1 as a *native* expression — no Python worker in the stream.

    Walk the ordered stop list (reversed when ``sens != 1``,
    src/naolib_consumer.py:111-114); a bus is AT a stop when its wait is
    0 min, and BETWEEN prev|stop when prev's wait > this stop's wait > 0
    (src/naolib_consumer.py:89-104). First matching measurement per stop
    wins, like the reference's ``next()``.
    """
    fwd = F.array(*[F.lit(s) for s in ordered_stops])
    rev = F.array(*[F.lit(s) for s in reversed(ordered_stops)])
    ordered = F.when(sens_col == 1, fwd).otherwise(rev)

    def minutes_at(stop: Column) -> Column:
        return F.get(
            F.filter(stops_col, lambda s: s["stop"] == stop), 0
        )["minutes"]

    def position(stop: Column, i: Column) -> Column:
        cur = minutes_at(stop)
        prev_stop = F.get(ordered, i - 1)  # null at i=0
        prev = minutes_at(prev_stop)
        at_stop = F.struct(
            stop.alias("location"), F.lit(True).alias("status")
        )
        between = F.struct(
            F.concat_ws("|", prev_stop, stop).alias("location"),
            F.lit(False).alias("status"),
        )
        return (
            F.when(cur == 0, at_stop)
            .when((cur > 0) & (prev > cur), between)
            .otherwise(
                F.lit(None).cast("struct<location:string,status:boolean>")
            )
        )

    walked = F.transform(ordered, lambda s, i: position(s, i))
    return F.filter(walked, lambda x: x.isNotNull())


def make_detect_positions_udf(ordered_stops: list[str]):
    """U1 as a vectorized pandas UDF — reference-parity twin of
    :func:`detect_positions_expr` (equivalence-tested). Arrow-batched:
    one Python roundtrip per micro-batch, not per row."""

    @F.pandas_udf(POSITION_SCHEMA)
    def detect(stops: pd.Series, sens: pd.Series) -> pd.Series:
        out = []
        for row_stops, row_sens in zip(stops, sens):
            order = (
                ordered_stops if row_sens == 1 else list(reversed(ordered_stops))
            )
            lookup = {}
            for item in row_stops if row_stops is not None else []:
                lookup.setdefault(item["stop"], item["minutes"])
            result = []
            for idx, stop in enumerate(order):
                cur = lookup.get(stop)
                prev = lookup.get(order[idx - 1]) if idx > 0 else None
                if cur == 0:
                    result.append({"location": stop, "status": True})
                elif (
                    cur is not None
                    and prev is not None
                    and cur > 0
                    and prev > cur
                ):
                    result.append(
                        {"location": f"{order[idx - 1]}|{stop}", "status": False}
                    )
            out.append(result)
        return pd.Series(out)

    return detect


def q3_bus_positions(
    positions_df: DataFrame,
    ordered_stops: list[str],
    line: str | None = None,
    window: str = "1 minute",
    watermark: str = "1 minute",
    use_udf: bool = False,
) -> DataFrame:
    """Live estimated bus positions per (event-time window, direction).

    Stream shape (src/naolib_consumer.py:56-117): keep real-time
    measurements only, parse wait minutes ("proche" → 0), window +
    collect measurements per direction, then walk the ordered stop list.
    Works on batch input too (windowed_agg is mode-agnostic).
    """
    df = positions_df
    if line is not None:
        df = df.filter(F.col("numLigne") == line)
    df = (
        df.filter(F.col("tempsReel") == "true")
        .withColumn("minutes", parse_wait_minutes("temps"))
        .withColumn("created_at", F.col("created_at").cast("timestamp"))
    )
    agg = windowed_agg(
        df,
        "created_at",
        window,
        [F.collect_list(F.struct("stop", "minutes")).alias("stops")],
        group_cols=["sens"],
        watermark=watermark,
    )
    if use_udf:
        detect = make_detect_positions_udf(ordered_stops)
        return agg.withColumn("positions", detect(F.col("stops"), F.col("sens")))
    return agg.withColumn(
        "positions",
        detect_positions_expr(F.col("stops"), F.col("sens"), ordered_stops),
    )


# ---------------------------------------------------------------------------
# Q4 — bike-station occupancy (src/bike_consumer.py)
# ---------------------------------------------------------------------------
def q4_bike_occupancy(
    stations_df: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Average per-station availability per window + ASCII occupancy bar.

    Reference shape (src/bike_consumer.py:76-139): cast stringly-typed
    counts, event-time = last_update (ISO+offset), 3×avg per
    (name, address, window), bar via U2 — here a native
    repeat/concat expression (SURVEY §2.10), no Python worker.
    Output sorted by window/station (complete-mode display order, O1).
    """
    parsed = (
        stations_df.select(
            "name",
            "address",
            F.col("available_bikes").try_cast("int").alias("available_bikes"),
            F.col("available_bike_stands")
            .try_cast("int")
            .alias("available_bike_stands"),
            F.col("bike_stands").try_cast("int").alias("bike_stands"),
            F.to_timestamp(
                "last_update", "yyyy-MM-dd'T'HH:mm:ssXXX"
            ).alias("last_update"),
        )
    )
    agg = windowed_agg(
        parsed,
        "last_update",
        window,
        [
            F.avg("available_bikes").alias("avg_bikes"),
            F.avg("available_bike_stands").alias("avg_stands"),
            F.avg("bike_stands").alias("avg_total"),
        ],
        group_cols=["name", "address"],
        watermark=watermark,
    )
    out = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col("name").alias("station"),
        "address",
        "avg_bikes",
        "avg_stands",
        "avg_total",
        occupancy_bar(
            F.col("avg_bikes"), F.col("avg_stands"), F.col("avg_total")
        ).alias("bar"),
    )
    # Global sort is only legal on streams in complete output mode
    # (src/bike_consumer.py:139-146); on batch it's always fine.
    return out.orderBy("window_start", "station")


# ---------------------------------------------------------------------------
# wind — streaming dedup + tumbling average (src/previous_tp_code.py)
# ---------------------------------------------------------------------------
def wind_rolling_average(
    wind_df: DataFrame,
    window: str = "5 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Dedup by entry_id, then tumbling-window average wind speed.

    Fixes §2.11 bugs 2-3: the null filter applies to the *projected*
    ``wind_speed`` (the reference filtered a dropped struct path, an
    AnalysisException if run), and the watermark is only attached to
    streaming input.
    """
    df = (
        wind_df.select(
            F.col("created_at").try_cast("timestamp").alias("created_at"),
            F.col("entry_id").try_cast("int").alias("entry_id"),
            F.col("wind_speed").try_cast("float").alias("wind_speed"),
        )
        .filter(F.col("wind_speed").isNotNull())
    )
    if df.isStreaming:
        df = df.withWatermark("created_at", watermark)
    df = df.dropDuplicates(["entry_id"])
    agg = windowed_agg(
        df,
        "created_at",
        window,
        [F.avg("wind_speed").alias("avg_wind_speed")],
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "avg_wind_speed",
    )

"""The reference's four declared queries + wind pipeline on
FIXTURES.md-shaped fixtures, with hand-computed expected results
(the reference repo has no tests — SURVEY §5 — so these pin intended
semantics, including the §2.11 bug fixes)."""

from __future__ import annotations

import pytest

from ue_big_data_project_spark.queries import reference as R

STOPS = ["AAAA", "BBBB", "CCCC", "DDDD"]


@pytest.fixture(scope="module")
def plane_df(spark):
    rows = [
        # icao24, firstSeen, dep, lastSeen (arrival), arr, callsign
        ("ab1", 1000, "LFPG", 1_742_200_000, "LFRS", "AF1"),
        ("ab2", 1000, "LFPG", 1_742_203_600, "LFRS", "AF2"),
        ("out", 1000, "LFPG", 1_742_900_000, "LFRS", "AF3"),  # outside range
    ]
    return spark.createDataFrame(
        [(i, f, d, l, a, c, 0, 0, 0, 0, 0, 0) for i, f, d, l, a, c in rows],
        "icao24 string, firstSeen int, estDepartureAirport string, "
        "lastSeen int, estArrivalAirport string, callsign string, "
        "estDepartureAirportHorizDistance int, estDepartureAirportVertDistance int, "
        "estArrivalAirportHorizDistance int, estArrivalAirportVertDistance int, "
        "departureAirportCandidatesCount int, arrivalAirportCandidatesCount int",
    )


@pytest.fixture(scope="module")
def bus_df(spark):
    # 1742200000 = 2025-03-17 08:26:40 UTC
    return spark.createDataFrame(
        [
            (38, "8h", ["10", "30d", "50"]),
            (98, "9h", ["05v", "45"]),
            (38, "25h", ["15"]),  # after-midnight encoding → 01:15
        ],
        "bus int, heure string, passages array<string>",
    )


def test_q1_plane_bus_wait(spark, plane_df, bus_df):
    out = {
        r["icao24"]: (r["bus"], r["wait_minutes"], r["wait_display"])
        for r in R.q1_plane_bus_wait(
            plane_df,
            bus_df,
            begin_epoch=1_742_166_015,
            end_epoch=1_742_252_385,
            service_date="2025-03-17",
        ).collect()
    }
    # ab1 arrives 08:26:40 UTC → next bus 08:30 (bus 38, "30d") → 3 min
    assert out["ab1"] == (38, 3, "3m")
    # ab2 arrives 09:26:40 → next bus 09:45 (bus 98, "45") → 18 min
    assert out["ab2"] == (98, 18, "18m")
    assert "out" not in out  # epoch-range filter (parameterized, §2.11.5)


def test_q2_affluence_counts_rows_not_chars(spark):
    df = spark.createDataFrame(
        [
            ("23", "CRQU4", "6h", "01"),
            ("23", "CRQU4", "6h", "22"),  # "22" must count once, not twice
            ("23", "CRQU4", "7h", "15v"),
            ("23", "CRQU4", "25h", "40"),  # → 01:00
            ("12", "OTHER", "6h", "09"),  # other stop filtered out
        ],
        "numLigne string, stop string, heure string, passage string",
    )
    got = {
        r["hour"]: r["bus_count"]
        for r in R.q2_affluence_per_hour(df, stop="CRQU4", line="23").collect()
    }
    assert got == {"06:00": 2, "07:00": 1, "01:00": 1}


@pytest.fixture(scope="module")
def positions_df(spark):
    base = "2025-03-25T14:05:{:02d}"
    rows = []
    # Direction 1: bus AT BBBB (0 min); another approaching DDDD:
    # CCCC=5, DDDD=2 → between CCCC|DDDD.
    for stop, temps in [
        ("AAAA", "7mn"),
        ("BBBB", "proche"),
        ("CCCC", "5mn"),
        ("DDDD", "2mn"),
    ]:
        rows.append((1, "Term", False, temps, "true", stop, "C6", base.format(1)))
    # Direction 2 (reversed order DDDD..AAAA): bus between CCCC|BBBB.
    for stop, temps in [
        ("DDDD", "9mn"),
        ("CCCC", "6mn"),
        ("BBBB", "3mn"),
        ("AAAA", "8mn"),
    ]:
        rows.append((2, "Term", False, temps, "true", stop, "C6", base.format(2)))
    # Non-realtime row must be ignored.
    rows.append((1, "Term", False, "1mn", "false", "AAAA", "C6", base.format(3)))
    return spark.createDataFrame(
        rows,
        "sens int, terminus string, infotrafic boolean, temps string, "
        "tempsReel string, stop string, numLigne string, created_at string",
    )


@pytest.mark.parametrize("use_udf", [False, True])
def test_q3_positions_native_and_udf(spark, positions_df, use_udf):
    out = R.q3_bus_positions(
        positions_df, STOPS, line="C6", use_udf=use_udf
    ).collect()
    by_sens = {r["sens"]: r["positions"] for r in out}
    sens1 = {(p["location"], p["status"]) for p in by_sens[1]}
    # AT BBBB; CCCC(5) > DDDD(2) > 0 → between CCCC|DDDD.
    assert sens1 == {("BBBB", True), ("CCCC|DDDD", False)}
    sens2 = {(p["location"], p["status"]) for p in by_sens[2]}
    # Reversed walk DDDD→AAAA: DDDD(9)>CCCC(6) → DDDD|CCCC;
    # CCCC(6)>BBBB(3) → CCCC|BBBB; BBBB(3) < AAAA(8) → no.
    assert sens2 == {("DDDD|CCCC", False), ("CCCC|BBBB", False)}


def test_q3_native_equals_udf(spark, positions_df):
    a = R.q3_bus_positions(positions_df, STOPS, use_udf=False).collect()
    b = R.q3_bus_positions(positions_df, STOPS, use_udf=True).collect()
    key = lambda r: (r["sens"], r["window"]["start"])
    norm = lambda rows: {
        key(r): [(p["location"], p["status"]) for p in r["positions"]]
        for r in rows
    }
    assert norm(a) == norm(b)


def test_q4_bike_occupancy(spark):
    df = spark.createDataFrame(
        [
            ("Lieu Unique", "042", "Quai", "7", "13", 20, "2025-03-25T14:04:58+01:00"),
            ("Lieu Unique", "042", "Quai", "9", "11", 20, "2025-03-25T14:05:28+01:00"),
            # discrepancy: 5 + 10 != 20 → 5 '?'
            ("Gare", "001", "Rue", "5", "10", 20, "2025-03-25T14:04:10+01:00"),
            # null count → [No data]
            ("Moisson", "002", "Av", None, "4", 10, "2025-03-25T14:04:20+01:00"),
        ],
        "name string, number string, address string, available_bikes string, "
        "available_bike_stands string, bike_stands int, last_update string",
    )
    rows = R.q4_bike_occupancy(df, window="10 minutes").collect()
    bars = {r["station"]: r["bar"] for r in rows}
    assert bars["Lieu Unique"] == "#" * 8 + "-" * 12  # avgs 8 & 12, no gap
    assert bars["Gare"] == "#" * 5 + "-" * 10 + "?" * 5
    assert bars["Moisson"] == "[No data]"
    # ordered by window_start then station (O1)
    assert [r["station"] for r in rows] == sorted(bars)


def test_wind_pipeline_dedup_and_average(spark):
    df = spark.createDataFrame(
        [
            ("2025-01-25T16:00:12Z", 1, "3.0"),
            ("2025-01-25T16:01:12Z", 1, "3.0"),  # duplicate entry_id
            ("2025-01-25T16:02:12Z", 2, "5.0"),
            ("2025-01-25T16:03:12Z", 3, "bad"),  # null after cast → dropped
            ("2025-01-25T16:07:12Z", 4, "7.0"),  # next 5-min window
        ],
        "created_at string, entry_id int, wind_speed string",
    )
    rows = R.wind_rolling_average(df).collect()
    got = {r["window_start"].isoformat(): r["avg_wind_speed"] for r in rows}
    assert got == {"2025-01-25T16:00:00": 4.0, "2025-01-25T16:05:00": 7.0}


def test_events_ewma_matches_python_recurrence(spark):
    """The native array-fold EWMA equals the textbook per-key loop."""
    import datetime as dt

    from ue_big_data_project_spark.queries.events import events_ewma

    # Drive through a temp parquet dir shaped like the testdata so the
    # query's load_tables path is exercised end-to-end.
    import tempfile, os, shutil

    tmp = tempfile.mkdtemp(prefix="ewma_")
    try:
        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(minutes=i), i % 3, "click", float(v), "{}")
            for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90])
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.user_id: (r.n_events, r.ewma_value)
            for r in events_ewma(spark, tmp).collect()
        }
        expect = {}
        for u in range(3):
            vals = [float(v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90]) if i % 3 == u]
            acc = vals[0]
            for x in vals[1:]:
                acc = 0.3 * x + 0.7 * acc
            expect[u] = (len(vals), acc)
        for u, (n, e) in expect.items():
            assert got[u][0] == n
            assert abs(got[u][1] - e) < 1e-6, u
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_events_ewma_over_threshold_key_raises(spark):
    """The bounded-per-key contract is ENFORCED (round-4 verdict task
    5): a key whose history exceeds max_per_key fails loudly instead of
    silently materializing an unbounded row."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    import pytest

    from ue_big_data_project_spark.queries.events import events_ewma

    tmp = tempfile.mkdtemp(prefix="ewma_guard_")
    try:
        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(minutes=i), i % 2, "click", float(i), "{}")
            for i in range(12)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        # 6 events per key: fine at the default threshold...
        assert events_ewma(spark, tmp).count() == 2
        # ...and a loud failure BEFORE the fold materializes anything
        # when the per-key bound is exceeded (the guard is a cheap
        # counting pre-pass, so it raises at query-build time).
        with pytest.raises(ValueError, match="bounded-per-key contract"):
            events_ewma(spark, tmp, max_per_key=5)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

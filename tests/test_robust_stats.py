"""mad_outliers + interpolate_daily_counts exact-integer semantics."""

import datetime

from pyspark.sql import functions as F


def test_mad_flags_only_true_outlier(spark):
    from samba_spark.operators.sessionize import mad_outliers

    base = datetime.datetime(2026, 1, 1)
    rows = [
        (i, base, "a", v)
        for i, v in enumerate([10.0, 10.0, 11.0, 9.0, 10.0, 12.0, 1000.0])
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    got = mad_outliers(df).collect()
    assert [r.event_id for r in got] == [6]
    r = got[0]
    # median 10.00 -> med2 = 2000 cents*2; MAD = 100 cents-dev -> mad4=400
    assert r.med2 == 2000
    assert r.mad4 == 400
    assert r.dev4 == abs(2 * 100000 - 2000) * 2


def test_mad_constant_group_flags_any_deviation(spark):
    from samba_spark.operators.sessionize import mad_outliers

    base = datetime.datetime(2026, 1, 1)
    rows = [(i, base, "c", 5.0) for i in range(9)] + [(9, base, "c", 5.01)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    # MAD = 0: every nonzero deviation is infinitely many MADs out
    got = mad_outliers(df).collect()
    assert [r.event_id for r in got] == [9]


def test_interpolation_straight_line(spark):
    from samba_spark.operators.sessionize import interpolate_daily_counts

    def d(day):
        return datetime.datetime(2026, 3, day)

    # user 1: 4 events day1, gap of two days, 1 event day4
    rows = (
        [(i, d(1), 1, "e", 0.0, "") for i in range(4)]
        + [(10, d(4), 1, "e", 0.0, "")]
        + [(20, d(2), 2, "e", 0.0, "")]
    )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        (r.user_id, r.day.isoformat()): (r.observed, r.count_x1000)
        for r in interpolate_daily_counts(df).collect()
    }
    assert got[(1, "2026-03-01")] == (True, 4000)
    assert got[(1, "2026-03-02")] == (False, 3000)  # 4 -> 1 over 3 days
    assert got[(1, "2026-03-03")] == (False, 2000)
    assert got[(1, "2026-03-04")] == (True, 1000)
    # single-day user: one observed row, nothing interpolated
    assert got[(2, "2026-03-02")] == (True, 1000)
    assert len([k for k in got if k[0] == 2]) == 1

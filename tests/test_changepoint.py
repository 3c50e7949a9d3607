"""cusum_changepoints: hand-checked splits on tiny series."""

from __future__ import annotations

from reactive_kinesis_spark.queries.events import cusum_changepoints


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, t long, x long")
    return {r.g: r for r in cusum_changepoints(df, ["g"], "t", "x").collect()}


def test_level_shift_found_at_shift(spark):
    # flat 1,1,1 then jump to 5,5,5 -> split after t=3
    rows = [("a", t, 1) for t in (1, 2, 3)] + [("a", t, 5) for t in (4, 5, 6)]
    got = _run(spark, rows)["a"]
    assert got.change_point == 3
    assert got.mean_before == 1.0
    assert got.mean_after == 5.0
    # D at i=3: |6*3 - 3*18| = 36; stat = 36 / (6*18)
    assert got.cusum_stat == 36 / 108


def test_tie_breaks_to_earliest(spark):
    # constant series: every split has D=0 -> earliest interior split wins
    rows = [("a", t, 2) for t in (1, 2, 3, 4)]
    got = _run(spark, rows)["a"]
    assert got.change_point == 1
    assert got.cusum_stat == 0.0


def test_single_row_group_dropped(spark):
    rows = [("a", 1, 3), ("b", 1, 1), ("b", 2, 9)]
    got = _run(spark, rows)
    assert set(got) == {"b"}
    assert got["b"].change_point == 1
    assert got["b"].mean_before == 1.0 and got["b"].mean_after == 9.0


def test_deterministic_across_partitionings(spark):
    rows = [("g%d" % (i % 7), t, (i * 13 + t * 7) % 11) for i in range(21) for t in range(12)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    a = sorted(map(tuple, cusum_changepoints(df, ["g"], "t", "x").collect()))
    b = sorted(
        map(
            tuple,
            cusum_changepoints(df.repartition(16, "t"), ["g"], "t", "x").collect(),
        )
    )
    assert a == b

"""Round-7 session-2 operators: quantile normalization."""

from __future__ import annotations

from reactive_kinesis_spark.queries.advanced import quantile_normalize


def test_quantile_normalize_aligns_equal_groups(spark):
    # two groups with the same shape but shifted values -> after
    # normalization both carry the per-rank cross-group means
    rows = [
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
        ("b", 4, 110), ("b", 5, 120), ("b", 6, 130),
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_normalize(df, "g", "v", "id").collect()
    norm = {r.id: r.normalized for r in out}
    assert norm == {1: 60.0, 4: 60.0, 2: 70.0, 5: 70.0, 3: 80.0, 6: 80.0}
    ranks = {r.id: r.rank for r in out}
    assert ranks == {1: 1, 4: 1, 2: 2, 5: 2, 3: 3, 6: 3}


def test_quantile_normalize_unequal_groups_average_present_ranks(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("b", 3, 100)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    norm = {r.id: r.normalized for r in quantile_normalize(df, "g", "v", "id").collect()}
    assert norm[1] == 55.0 and norm[3] == 55.0  # rank 1 over both groups
    assert norm[2] == 20.0  # rank 2 exists only in group a


def test_quantile_normalize_tie_break_is_total(spark):
    # equal values: id breaks the tie, so ranks are deterministic
    rows = [("a", 2, 5), ("a", 1, 5), ("b", 9, 7)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    ranks = {r.id: r.rank for r in quantile_normalize(df, "g", "v", "id").collect()}
    assert ranks[1] == 1 and ranks[2] == 2 and ranks[9] == 1

"""association_rules: hand-checked metrics on a tiny basket relation."""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.operators.mining import association_rules


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules(df, "b", "i", **kw).collect()
    return {(r.antecedent, r.consequent): r for r in out}


def test_metrics_hand_checked(spark):
    # 4 baskets: {x,y} {x,y} {x,z} {y}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"), (4, "y")]
    got = _rules(spark, rows, min_pair_count=2)
    # only (x,y) survives min_pair_count=2; both directions emitted
    assert set(got) == {("x", "y"), ("y", "x")}
    xy = got[("x", "y")]
    assert xy.pair_count == 2
    assert xy.support == 2 / 4
    assert xy.confidence == 2 / 3  # x in 3 baskets
    assert xy.lift == (2 * 4) / (3 * 3)
    yx = got[("y", "x")]
    assert yx.confidence == 2 / 3  # y in 3 baskets
    assert yx.lift == xy.lift  # lift is symmetric


def test_duplicate_rows_count_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    got = _rules(spark, rows, min_pair_count=2)
    assert got[("x", "y")].pair_count == 2
    assert got[("x", "y")].support == 1.0


def test_hub_basket_cap_drops_before_pairs(spark):
    # basket 1 has 5 items (capped away at 4); basket 2/3 carry the pair
    rows = [(1, c) for c in "abcde"] + [(2, "a"), (2, "b"), (3, "a"), (3, "b")]
    got = _rules(spark, rows, min_pair_count=2, max_basket_size=4)
    assert got[("a", "b")].pair_count == 2  # basket 1 contributed nothing


def test_min_pair_count_validated(spark):
    df = spark.createDataFrame([(1, "x")], "b long, i string")
    with pytest.raises(ValueError):
        association_rules(df, "b", "i", min_pair_count=0)

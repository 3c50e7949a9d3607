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


# ---------------------------------------------------------------- gini


def test_gini_even_distribution_is_zero(spark):
    from reactive_kinesis_spark.queries.advanced import gini_concentration

    rows = [("g", i, 10) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, id long, x long")
    got = gini_concentration(df, "grp", "x", "id").collect()[0]
    assert got.gini == 0.0 and got.n == 4 and got.total == 40


def test_gini_total_concentration_approaches_one(spark):
    from reactive_kinesis_spark.queries.advanced import gini_concentration

    # one member owns everything: G = (n-1)/n
    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 0), ("g", 4, 100)]
    df = spark.createDataFrame(rows, "grp string, id long, x long")
    got = gini_concentration(df, "grp", "x", "id").collect()[0]
    assert got.gini == 3 / 4


def test_gini_zero_total_group_dropped(spark):
    from reactive_kinesis_spark.queries.advanced import gini_concentration

    rows = [("z", 1, 0), ("z", 2, 0), ("a", 1, 5)]
    df = spark.createDataFrame(rows, "grp string, id long, x long")
    got = {r.grp for r in gini_concentration(df, "grp", "x", "id").collect()}
    assert got == {"a"}


# ---------------------------------------------------------- attribution


def test_attribution_last_touch_within_window(spark):
    import datetime as dt

    from reactive_kinesis_spark.queries import load_all

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, user, typ, sec):
        return (i, t0 + dt.timedelta(seconds=sec), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0),
        ev(2, 1, "view", 10),     # last touch before first purchase
        ev(3, 1, "purchase", 20),
        ev(4, 1, "purchase", 25),  # attributed to the same view (still <=1h)
        ev(5, 2, "click", 0),
        ev(6, 2, "purchase", 4000),  # beyond 1h -> unattributed
        ev(7, 3, "purchase", 0),     # no prior touch -> unattributed
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.source: r for r in load_all()["q132_attribution"].fn(spark, d).collect()}
    assert set(out) == {"view"}
    assert out["view"].n_attributed == 2
    assert out["view"].share == 1.0
    assert out["view"].avg_lag_sec == (10 + 15) / 2


# --------------------------------------------------------------- lorenz


def test_lorenz_deciles_monotone_and_terminal(spark, sf_dir):
    from reactive_kinesis_spark.queries import load_all

    rows = load_all()["q133_lorenz_deciles"].fn(spark, sf_dir).collect()
    assert rows
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs = sorted(rs, key=lambda r: r.decile)
        shares = [r.cum_share for r in rs]
        assert shares == sorted(shares), nation  # Lorenz curve is monotone
        assert rs[-1].decile == 10 and rs[-1].cum_share == 1.0, nation
        # bottom deciles never hold more than their population share
        for r in rs:
            assert r.cum_share <= r.decile / 10 + 1e-12, (nation, r.decile)


# ----------------------------------------------------------- burstiness


def test_burstiness_metronome_is_minus_one_and_range(spark, sf_dir):
    import datetime as dt
    import tempfile

    from reactive_kinesis_spark.queries import load_all

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: perfectly regular 60s gaps -> sigma=0 -> B = -1
    for k in range(5):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=60 * k), 1, "click", 1.0, "{}"))
    # user 2: bursty (tiny gaps then a huge one)
    for sec in (0, 1, 2, 100000):
        eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=sec), 2, "click", 1.0, "{}"))
    # user 3: single event -> dropped (no gaps)
    rows.append((999, t0, 3, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.user_id: r for r in
               load_all()["q134_interarrival_burstiness"].fn(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1].sigma_gap_sec == 0.0 and out[1].burstiness == -1.0
    assert out[1].mean_gap_sec == 60.0
    assert 0.0 < out[2].burstiness < 1.0  # bursty user trends positive

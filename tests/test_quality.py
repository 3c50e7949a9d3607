"""Constraint-suite tests (operators/quality.check_constraints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.quality import check_constraints


def _by_check(rows):
    return {(r.check_name, r.column_name): r for r in rows}


def _df(spark):
    rows = [
        # id, name, status, score, ref
        (1, "alice", "A", 10.0, 100),
        (2, "bob", "A", 55.0, 200),
        (2, "carol", "B", -3.0, 999),   # dup id, range-low violation, bad ref
        (None, "dave", "Z", 200.0, None),  # null id, bad status, range-high
        (4, None, "B", None, 100),
    ]
    return spark.createDataFrame(
        rows, schema="id long, name string, status string, score double, ref long"
    )


def _dim(spark):
    return spark.createDataFrame([(100,), (200,)], schema="k long")


def test_all_check_kinds(spark):
    out = _by_check(
        check_constraints(
            _df(spark),
            not_null=("id", "name"),
            unique=("id",),
            ranges={"score": (0.0, 100.0)},
            accepted={"status": ("A", "B")},
            patterns={"name": "^[a-z]+$"},
            foreign_keys=[("ref", _dim(spark), "k")],
        ).collect()
    )
    assert out[("not_null", "id")].violations == 1
    assert out[("not_null", "name")].violations == 1
    # ids 1,2,2,4 non-null -> 4 rows, 3 distinct -> 1 surplus
    assert out[("unique", "id")].violations == 1
    # -3.0 and 200.0 out of bounds; NULL score is not a range violation
    assert out[("range", "score")].violations == 2
    assert out[("accepted_values", "status")].violations == 1
    assert out[("pattern", "name")].violations == 0
    # refs 100,200,999,100 non-null; 999 unmatched
    assert out[("foreign_key", "ref")].violations == 1
    assert all(r.total == 5 for r in out.values())
    assert out[("pattern", "name")].passed is True
    assert out[("range", "score")].passed is False


def test_multi_column_unique_and_one_sided_range(spark):
    df = _df(spark)
    out = _by_check(
        check_constraints(
            df,
            unique=(("id", "status"),),
            ranges={"score": (None, 100.0)},
        ).collect()
    )
    # non-null (id,status) rows: (1,A),(2,A),(2,B),(4,B) -> all distinct
    assert out[("unique", "id,status")].violations == 0
    # only the upper bound applies: 200.0 violates, -3.0 does not
    assert out[("range", "score")].violations == 1


def test_empty_input_is_all_green(spark):
    df = _df(spark).where(F.lit(False))
    rows = check_constraints(
        df,
        not_null=("id",),
        unique=("id",),
        ranges={"score": (0.0, 1.0)},
        foreign_keys=[("ref", _dim(spark), "k")],
    ).collect()
    assert len(rows) == 4
    assert all(r.total == 0 and r.violations == 0 and r.passed for r in rows)


def test_row_level_checks_share_one_scan(spark, sf_dir):
    from reactive_kinesis_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = check_constraints(
        orders,
        not_null=("o_orderkey", "o_custkey"),
        unique=("o_orderkey",),
        ranges={"o_totalprice": (0.0, None)},
        accepted={"o_orderstatus": ("O", "F", "P")},
        patterns={"o_orderpriority": "^[1-5]-"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole 6-check suite reads the table ONCE — no per-check scans
    assert plan.count("Scan parquet") == 1


def test_registry_query_shape(spark, sf_dir, ddb):
    from reactive_kinesis_spark.queries import load_all

    qd = load_all()["q112_quality_checks"]
    sdf = qd.fn(spark, sf_dir).toPandas()
    ddf = ddb.execute(qd.oracle).fetchdf()
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf) == 8
    assert sorted(sdf["check_name"].unique()) == sorted(ddf["check_name"].unique())

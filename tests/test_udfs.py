"""UDF/UDAF/UDTF surface tests (SURVEY.md §2.2 UDF row)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reactive_kinesis_spark import udfs
from reactive_kinesis_spark.tables import load_table


def test_row_udf_on_dimension(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    out = {
        r.r_name: r.bucket
        for r in region.select("r_name", udfs.region_bucket("r_name").alias("bucket")).collect()
    }
    assert out["ASIA"] == "EASTERN" and out["EUROPE"] == "WESTERN"


def test_pandas_scalar_udf_matches_jvm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    rows = emb.select(
        "vec_id",
        udfs.vec_l2_norm("embedding").alias("py_norm"),
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("jvm_norm"),
    ).collect()
    assert rows and all(math.isclose(r.py_norm, r.jvm_norm, rel_tol=1e-9) for r in rows)


def test_pandas_grouped_agg_udf(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 3.0)], "k string, n double"
    )
    out = {r.k: r.gini for r in df.groupBy("k").agg(udfs.gini_impurity("n").alias("gini")).collect()}
    assert out["a"] == 0.5  # two equal classes
    assert math.isclose(out["b"], 1 - (0.25**2 + 0.75**2))


def test_udtf_tokenize(spark):
    tokenize = udfs.make_tokenize_udtf()
    spark.udtf.register("tokenize", tokenize)
    df = spark.createDataFrame([(1, "hello world"), (2, None), (3, "x")], "doc_id long, text string")
    df.createOrReplaceTempView("docs_v")
    rows = spark.sql(
        "SELECT t.* FROM docs_v, LATERAL tokenize(doc_id, text) t ORDER BY doc_id, pos"
    ).collect()
    assert [(r.doc_id, r.pos, r.token) for r in rows] == [
        (1, 0, "hello"),
        (1, 1, "world"),
        (3, 0, "x"),
    ]

"""Tests: stream-static / stream-stream joins, skew helpers, batch IO."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark import io as rio
from reactive_kinesis_spark.operators.skew import (
    replicated_skew_join,
    salted_agg,
)
from reactive_kinesis_spark.schemas import EVENT_SCHEMA
from reactive_kinesis_spark.streaming import file_stream_source
from reactive_kinesis_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
)
from tests.test_streaming import T0, make_events


def _drain(spark, df, tmp_path, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_static_join_broadcast(spark, tmp_path):
    src = str(tmp_path / "stream")
    make_events(spark, 20).write.parquet(src, mode="append")
    dim = spark.createDataFrame(
        [("0", "alpha"), ("1", "beta")], "partition_key string, label string"
    )
    out = _drain(
        spark,
        stream_static_join(file_stream_source(spark, src), dim, on=["partition_key"]),
        tmp_path,
        "ssj",
    ).collect()
    assert len(out) == 20
    assert {(r.partition_key, r.label) for r in out} == {("0", "alpha"), ("1", "beta")}


def test_stream_stream_join_within_interval(spark, tmp_path):
    left_src = str(tmp_path / "left")
    right_src = str(tmp_path / "right")
    make_events(spark, 10).write.parquet(left_src, mode="append")
    # right events: same keys, timestamps shifted +30s (within 1 minute)
    # and one row shifted +2h (outside the interval)
    rows = [
        ("s2", "sh0", str(i % 2), f"{500 + i:020d}", 0, b"r",
         T0 + dt.timedelta(seconds=i + 30))
        for i in range(10)
    ] + [("s2", "sh0", "0", f"{900:020d}", 0, b"far", T0 + dt.timedelta(hours=2))]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(right_src, mode="append")

    joined = stream_stream_join(
        file_stream_source(spark, left_src),
        file_stream_source(spark, right_src),
        key="partition_key",
        within="1 minute",
    )
    out = _drain(spark, joined, tmp_path, "s2s").collect()
    # every pair with same key and |Δts| <= 60s; the +2h row matches nothing
    left_ts = {i: T0 + dt.timedelta(seconds=i) for i in range(10)}
    right_ts = {i: T0 + dt.timedelta(seconds=i + 30) for i in range(10)}
    expect = sum(
        1
        for li, lt in left_ts.items()
        for ri, rt in right_ts.items()
        if li % 2 == ri % 2 and abs((lt - rt).total_seconds()) <= 60
    )
    assert len(out) == expect
    assert all(r.r_sequence_number != f"{900:020d}" for r in out)

    # batch twin: same helper on batch frames gives identical pairs
    batch = stream_stream_join(
        spark.read.schema(EVENT_SCHEMA).parquet(left_src),
        spark.read.schema(EVENT_SCHEMA).parquet(right_src),
        key="partition_key",
        within="1 minute",
    ).count()
    assert batch == expect


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), float(i)) for i in range(1000)],
        "k string, v double",
    )
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_agg(
            df, ["k"], {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert salted == plain


def test_salted_agg_hll(spark):
    df = spark.createDataFrame(
        [("a", i % 50) for i in range(500)] + [("b", i) for i in range(20)],
        "k string, v int",
    )
    out = {r.k: r.nd for r in salted_agg(df, ["k"], {"nd": ("count_distinct_approx", "v")}).collect()}
    assert abs(out["a"] - 50) <= 3 and abs(out["b"] - 20) <= 2


def test_replicated_skew_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(("hot" if i % 5 else f"k{i}"), i) for i in range(500)], "k string, v int"
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"L{i}") for i in range(0, 500, 5)],
        "k string, label string",
    )
    plain = sorted((r.k, r.v, r.label) for r in fact.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.label) for r in replicated_skew_join(fact, dim, "k").collect())
    assert salted == plain


def test_batch_io_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i}", float(i) / 7) for i in range(100)], "id long, s string, v double"
    )
    for fmt in ("parquet", "csv", "json", "orc"):
        path = str(tmp_path / fmt)
        rio.write_batch(df, path, fmt=fmt)
        back = rio.read_batch(
            spark, path, fmt=fmt,
            schema="id long, s string, v double" if fmt in ("csv", "json") else None,
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect())), fmt


def test_batch_io_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        rio.read_batch(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="format"):
        rio.read_batch(spark, str(tmp_path), fmt="avro")


def test_bucketed_join_has_no_shuffle(spark, tmp_path, sf_dir):
    """Bucket-aligned sort-merge join: both sides pre-bucketed on the join
    key must join with zero Exchange — the write-once-shuffle-never layout
    for recurring 100 TB joins."""
    from reactive_kinesis_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rio.write_bucketed(
        orders, "orders_b", buckets=4, bucket_by=["o_custkey"],
        sort_by=["o_custkey"], path=str(tmp_path / "orders_b"),
    )
    rio.write_bucketed(
        cust, "customer_b", buckets=4, bucket_by=["c_custkey"],
        sort_by=["c_custkey"], path=str(tmp_path / "customer_b"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (broadcast would trivially avoid the
        # shuffle and prove nothing about the bucketed layout)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = rio.read_table(spark, "orders_b").join(
            rio.read_table(spark, "customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the result is still correct vs the plain (shuffling) join
        expected = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_incremental_dedup_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming twin of q80: new documents arrive as a stream, are
    first-occurrence-deduplicated in-stream (stateful dropDuplicates on the
    fingerprint) and anti-joined against the static history ledger. The
    surviving fingerprint set must equal the batch operator's exactly
    (doc_id winners may differ: streaming keeps first-arrival, batch keeps
    min-id — both deterministic per contract, same fingerprint survivors)."""
    from reactive_kinesis_spark.operators.dedup import incremental_dedup
    from reactive_kinesis_spark.operators.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    incoming = docs.where(F.col("doc_id") % 5 == 4)
    history = docs.where(F.col("doc_id") % 5 != 4)

    src = str(tmp_path / "incoming_stream")
    incoming.write.parquet(src, mode="append")
    hist_fp = history.select(fingerprint("text").alias("fingerprint")).dropDuplicates()

    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .withColumn("fingerprint", fingerprint("text"))
        .dropDuplicates(["fingerprint"])
        .join(hist_fp, "fingerprint", "left_anti")
    )
    got = {
        r.fingerprint
        for r in _drain(spark, stream, tmp_path, "inc_dedup").collect()
    }
    expected = {
        r.fingerprint for r in incremental_dedup(incoming, history).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_incremental_dedup_bucketed_history_shuffles_only_the_delta(
    spark, tmp_path, sf_dir
):
    """The q80 scale claim, pinned: with the history fingerprint ledger
    stored bucketed on the join key, the anti join reads history
    pre-partitioned (zero Exchange on the corpus-sized side) and shuffles
    ONLY the incoming delta — exactly one Exchange in the plan."""
    from reactive_kinesis_spark.operators.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    history = docs.where(F.col("doc_id") % 5 != 4).select(
        fingerprint("text").alias("fingerprint")
    )
    rio.write_bucketed(
        history, "history_fp_b", buckets=4, bucket_by=["fingerprint"],
        sort_by=["fingerprint"], path=str(tmp_path / "history_fp_b"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge: broadcasting the delta would also avoid shuffling
        # history, but proves nothing about the bucketed-ledger layout a
        # 100 TB history (far beyond broadcast) depends on
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        incoming = docs.where(F.col("doc_id") % 5 == 4).withColumn(
            "fingerprint", fingerprint("text")
        )
        anti = incoming.join(
            rio.read_table(spark, "history_fp_b"), "fingerprint", "left_anti"
        )
        plan = anti._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert plan.count("Exchange") == 1  # the delta only; history never moves
        assert anti.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS history_fp_b")


def test_compact_files_reduces_count_and_preserves_content(spark, tmp_path, sf_dir):
    """Streaming sinks emit one file per trigger per partition; compaction
    must collapse them to the target layout without changing a single row."""
    src = str(tmp_path / "many_small")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(64).write.parquet(src)  # 64 tiny files

    stats = rio.compact_files(spark, src, target_bytes_per_file=1 << 30)
    assert stats["before"]["n_files"] == 64
    assert stats["after"]["n_files"] == 1
    assert stats["after"]["total_bytes"] > 0

    after = spark.read.parquet(src)
    assert after.count() == docs.count()
    assert sorted(r.doc_id for r in after.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_compact_files_respects_target_size(spark, tmp_path, sf_dir):
    src = str(tmp_path / "sized")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(32).write.parquet(src)
    total = rio.file_stats(spark, src)["total_bytes"]
    # pick a target that should yield ~4 files
    stats = rio.compact_files(spark, src, target_bytes_per_file=total // 4 + 1)
    assert 2 <= stats["after"]["n_files"] <= 5
    assert spark.read.parquet(src).count() == docs.count()


def test_salted_agg_targeted_matches_plain(spark):
    from reactive_kinesis_spark.operators.skew import detect_hot_keys

    df = spark.createDataFrame(
        [(("hot" if i % 10 else f"k{i}"), float(i)) for i in range(1000)],
        "k string, v double",
    )
    plain = {
        r.k: (r.n, r.total)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    targeted = {
        r.k: (r.n, r.total)
        for r in salted_agg(
            df, ["k"], {"n": ("count", "*"), "total": ("sum", "v")},
            hot_keys=["hot"],
        ).collect()
    }
    assert targeted == plain
    # auto-detection on the full frame (sample_fraction=1 keeps the test
    # deterministic and exact at this size)
    assert detect_hot_keys(df, "k", min_share=0.5, sample_fraction=1.0) == ["hot"]


def test_salted_agg_collect_list_is_bag_equal(spark):
    df = spark.createDataFrame(
        [(("hot" if i % 3 else f"k{i}"), i) for i in range(300)], "k string, v int"
    )
    plain = {
        r.k: sorted(r.bag)
        for r in df.groupBy("k").agg(F.collect_list("v").alias("bag")).collect()
    }
    salted = {
        r.k: sorted(r.bag)
        for r in salted_agg(
            df, ["k"], {"bag": ("collect_list", "v")}, hot_keys=["hot"]
        ).collect()
    }
    assert salted == plain
    sset = {
        r.k: sorted(r.bag)
        for r in salted_agg(
            df, ["k"], {"bag": ("collect_set", "v")}, hot_keys=["hot"]
        ).collect()
    }
    assert sset == {k: sorted(set(v)) for k, v in plain.items()}


def test_salted_agg_hot_keys_requires_single_key(spark):
    df = spark.createDataFrame([("a", "b", 1)], "k1 string, k2 string, v int")
    with pytest.raises(ValueError, match="one grouping key"):
        salted_agg(df, ["k1", "k2"], {"n": ("count", "*")}, hot_keys=["a"])


def test_streaming_curation_chunking_matches_batch(spark, tmp_path, sf_dir):
    """The 'one code path' claim driven end-to-end: the SAME narrow text
    operators (quality score filter → PII redaction → chunking) applied to
    a readStream frame must produce exactly the batch result. Stateless
    narrow stages — no watermark needed; dedup/sampling stages have their
    own streaming twins (dropDuplicates test above, q44's content-hash
    predicate is stateless too)."""
    from reactive_kinesis_spark.operators.text import (
        chunk_documents,
        quality_score,
        redact_pii,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "doc_stream")
    docs.write.parquet(src)

    def pipeline(frame):
        kept = frame.where(quality_score("text") >= F.lit(0.5))
        clean = redact_pii(kept, "text")
        return chunk_documents(
            clean.drop("text").withColumnRenamed("redacted", "text"),
            chunk_tokens=32,
            stride=24,
        )

    batch = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in pipeline(docs).collect()
    }
    stream_out = _drain(
        spark,
        pipeline(spark.readStream.schema(docs.schema).parquet(src)),
        tmp_path,
        "cur_chunk",
    )
    streamed = {
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in stream_out.collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_range_layout_files_carry_tight_bands(spark, tmp_path, sf_dir):
    """write_range_layout must produce files whose parquet footers hold
    tight, (near-)disjoint min/max bands on the range key, so a range
    predicate intersects O(selectivity) of them — while the same data
    written unsorted intersects nearly all files. Pruning effectiveness
    is asserted structurally from the footers (what file/row-group skip
    reads), plus the filter must reach the scan as a pushed predicate."""
    import os

    import pyarrow.parquet as pq

    from reactive_kinesis_spark import io as rio

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "value")

    ranged = str(tmp_path / "ranged")
    naive = str(tmp_path / "naive")
    rio.write_range_layout(ev, ranged, ["event_id"], files=8)
    ev.repartition(8).write.parquet(naive)

    def bands(path):
        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            col = md.row_group(0).column(0)
            assert col.path_in_schema == "event_id"
            lo = min(md.row_group(g).column(0).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(0).statistics.max for g in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    rb, nb = bands(ranged), bands(naive)
    assert len(rb) == 8
    n = ev.count()
    probe_lo, probe_hi = n // 2, n // 2 + n // 100  # a ~1% id slice
    hit = lambda b: not (b[1] < probe_lo or b[0] > probe_hi)  # noqa: E731
    assert sum(map(hit, rb)) <= 2          # tight bands: at most a boundary pair
    assert sum(map(hit, nb)) >= len(nb) - 1  # unsorted: almost every file intersects

    # and the predicate itself must be pushed to the scan
    q = spark.read.parquet(ranged).where(
        (F.col("event_id") >= probe_lo) & (F.col("event_id") <= probe_hi)
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(event_id" in plan

    # round-trip correctness: the layout rewrite loses no rows
    assert spark.read.parquet(ranged).count() == n


def test_zorder_layout_prunes_on_every_clustered_dimension(spark, tmp_path, sf_dir):
    """write_zorder_layout must give every file a bounded footer band on
    BOTH clustered columns — so single-column probes on EITHER dimension
    skip files — where the 1-D range layout prunes only its own key and a
    second-column probe hits every file. Bands are asserted structurally
    from the parquet footers (what file skipping actually reads). The
    probe on `value` uses its MASS quartile (the column is heavy-tailed;
    equi-depth bucketing is exactly why the high Z-bits still
    discriminate there)."""
    import os

    import pyarrow.parquet as pq

    from reactive_kinesis_spark import io as rio

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zp, rp = str(tmp_path / "z"), str(tmp_path / "r")
    rio.write_zorder_layout(ev, zp, ["user_id", "value"], files=16)
    rio.write_range_layout(ev, rp, ["user_id"], files=16)

    def bands(path, colname):
        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = {
                md.row_group(0).column(k).path_in_schema: k
                for k in range(md.row_group(0).num_columns)
            }[colname]
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out.append((lo, hi))
        return out

    u_hi = ev.agg(F.max("user_id")).collect()[0][0]
    v_q1 = ev.approxQuantile("value", [0.25], 0.01)[0]
    uq = (0, u_hi // 4)
    vq = (float("-inf"), v_q1)
    hit = lambda b, q: not (b[1] < q[0] or b[0] > q[1])  # noqa: E731

    zu, zv = bands(zp, "user_id"), bands(zp, "value")
    ru, rv = bands(rp, "user_id"), bands(rp, "value")
    # range partitioning may merge files when the key has few distinct
    # values at tiny SF; assert against the actual file counts
    assert len(zu) >= 12 and len(ru) >= 12
    # z-order: BOTH dimensions prune (a quartile probe skips >= 1/4 of files)
    assert sum(hit(b, uq) for b in zu) <= 0.75 * len(zu)
    assert sum(hit(b, vq) for b in zv) <= 0.75 * len(zv)
    # 1-D range layout: its own key prunes harder, the other not at all
    assert sum(hit(b, uq) for b in ru) <= 0.45 * len(ru)
    assert sum(hit(b, vq) for b in rv) >= 0.9 * len(rv)
    # data fidelity
    assert spark.read.parquet(zp).count() == ev.count()


def test_zorder_layout_validates_inputs(spark, tmp_path, sf_dir):
    from reactive_kinesis_spark import io as rio

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pytest

    with pytest.raises(ValueError, match="2-4 cluster columns"):
        rio.write_zorder_layout(ev, str(tmp_path / "x"), ["user_id"])
    with pytest.raises(ValueError, match="bits"):
        rio.write_zorder_layout(ev, str(tmp_path / "x"), ["user_id", "value"], bits=20)

"""Event-stream queries over the ``events`` table (batch form).

These are the batch twins of the streaming operators (SURVEY.md §7 design
rule: every operator is DataFrame→DataFrame, so the same logic runs under
``readStream``). Time-window aggregation, JSON payload extraction, as-of
join, and sessionization mirror what the reference's consumers do to Kinesis
payloads downstream (decode → transform → aggregate).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactive_kinesis_spark.functions import davg_sql, dsum, dsum_sql
from reactive_kinesis_spark.operators.relational import asof_join, top_k_per_group
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


@query(
    "q17_events_hourly_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')},
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY hour_start, event_type
    ORDER BY hour_start, event_type
    """,
)
def q17_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — the batch twin of the
    Structured-Streaming ``window()`` aggregate (hour windows align to epoch,
    so ``window('1 hour').start == date_trunc('hour', ts)``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_start", "event_type")
    )


@query(
    "q18_events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q18_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload field extraction + aggregation — the batch form of
    decode-payload (reference models/ConsumerEvent.scala:60-61 decodes bytes;
    our engine continues into typed extraction)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("int")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "q19_events_asof_join",
    oracle="""
    WITH latest_order AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC
                   ) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
    FROM events e
    ASOF LEFT JOIN latest_order o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def q19_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks up the customer's most recent order at
    event time — union+window idiom (one shuffle; see operators.relational
    .asof_join), verified against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    latest = (
        top_k_per_group(
            orders,
            ["o_custkey", "o_orderdate"],
            [F.col("o_orderkey").desc()],
            k=1,
        )
        .drop("rn")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        latest,
        key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice").orderBy(
        "event_id"
    )


@query(
    "q20_events_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q20_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via the gaps-and-islands
    window idiom — the batch twin of ``session_window()`` in streaming."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > 1800),
        1,
    ).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(wf).cast("long")
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q39_sliding_window",
    oracle=f"""
    WITH starts AS (
        SELECT date_trunc('hour', ts) AS ws, value FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
    )
    SELECT ws AS window_start, ws + INTERVAL 2 HOUR AS window_end,
           COUNT(*) AS n_events, {dsum_sql('value', 'sum_value')}
    FROM starts GROUP BY ws ORDER BY ws
    """,
)
def q39_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h size / 1h slide) through the SAME
    streaming helper used under readStream (streaming.windows
    .windowed_aggregate) — each event lands in exactly two windows; the
    oracle reproduces that as a union of two offset tumbling grids."""
    from reactive_kinesis_spark.streaming.windows import windowed_aggregate

    ev = load_table(spark, sf_dir, "events")
    return windowed_aggregate(
        ev, ts_col="ts", window="2 hours", slide="1 hour", value_col="value"
    ).orderBy("window_start")


@query(
    "q40_salted_agg",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')},
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q40_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators.skew.salted_agg): the hot
    key fans out over 32 salt buckets in phase 1, partials merge per key in
    phase 2 — results provably identical to the plain groupBy (the oracle IS
    the plain groupBy)."""
    from reactive_kinesis_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(38,6)")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "*"),
            "sum_value_dec": ("sum", "value_dec"),
            "max_value": ("max", "value"),
        },
        buckets=32,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("event_type")


@query(
    "q41_interval_self_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts BETWEEN a.ts - INTERVAL 1 MINUTE AND a.ts + INTERVAL 1 MINUTE
     AND a.event_id < b.event_id
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
)
def q41_interval_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join through the SAME helper that runs the
    watermarked stream-stream join under readStream (streaming.joins
    .stream_stream_join; on batch frames the time bound is a plain
    predicate): pairs of events from one user within ±1 minute."""
    from reactive_kinesis_spark.streaming.joins import stream_stream_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    j = stream_stream_join(
        ev, ev, key="user_id", left_ts="ts", right_ts="ts", within="1 minute"
    )
    return (
        j.where(F.col("event_id") < F.col("r_event_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "q78_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    outdeg AS (
        SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_out
        FROM trans GROUP BY prev_type
    )
    SELECT prev_type, event_type, n_trans,
           CAST(n_trans AS DOUBLE) / CAST(n_out AS DOUBLE) AS p_trans
    FROM trans JOIN outdeg USING (prev_type)
    ORDER BY prev_type, event_type
    """,
)
def q78_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-transition matrix (first-order Markov estimate):
    LAG over (user, time) sequences → transition counts → per-state
    row-normalized probabilities. The sessionization/funnel primitive next
    to q20's gap sessions. Exact-integer counts; ``p_trans`` is one IEEE
    division of int64s, bit-identical across engines.

    Shape: one user-keyed window (each task sees one user's events — user
    cardinality spreads; no global sort), transition counts via
    partial+final hash agg, then out-degrees as a WINDOW over the (tiny,
    |event_types|²-bounded) transition frame rather than a re-aggregate +
    join — a join's branches would re-evaluate the corpus-sized subtree
    (the q77 lesson); this is one linear chain, one corpus scan.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_out = Window.partitionBy("prev_type")
    return (
        trans.withColumn("n_out", F.sum("n_trans").over(w_out).cast("long"))
        .select(
            "prev_type",
            "event_type",
            "n_trans",
            (F.col("n_trans").cast("double") / F.col("n_out").cast("double")).alias(
                "p_trans"
            ),
        )
        .orderBy("prev_type", "event_type")
    )


def funnel(
    ev: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel depth per user: how far through ``steps`` (e.g.
    view → click → purchase) each user progressed, where step *i+1* must
    occur STRICTLY after the matched step *i* event. Greedy
    earliest-match — provably optimal for depth (taking the earliest
    possible event at each step can only enlarge the set of later events
    available for the next one), so depth is well-defined, not
    match-order-dependent.

    Spark-first shape: ONE user-keyed shuffle. Each user's events are
    gathered (``collect_list`` of (unix_micros, type) structs — partial
    aggregation ships per-task slices, not rows), ``array_sort``-ed, and
    folded through a Catalyst-lambda state machine (``F.aggregate`` with a
    (depth, last_ts) struct accumulator) — the whole match runs inside
    whole-stage-codegen'd expressions, no UDF, no second shuffle. The
    cascade alternative (one aggregate+join per step — what the DuckDB
    oracle runs) costs ``len(steps)`` corpus shuffles; this costs one,
    with per-user state bounded by that user's event count (the same
    bounded-entity contract as q20's sessions; for entities with unbounded
    history, window the input first).

    Returns ``(user_col, funnel_depth)``, depth in 0..len(steps).
    """
    steps_arr = F.array(*[F.lit(s) for s in steps])
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("e"),
            )
        )
    )
    init = F.struct(
        F.lit(0).cast("int").alias("d"), F.lit(-1).cast("long").alias("t")
    )

    def advance(acc, x):
        # try_element_at keeps the expression TOTAL: once acc.d ==
        # len(steps), the lookup is out of bounds and must yield NULL (→
        # hit is false), not throw under ANSI mode — correctness must not
        # hang on Spark's And evaluating the bound check first.
        hit = (
            (acc["d"] < F.lit(len(steps)))
            & (x["e"] == F.try_element_at(steps_arr, acc["d"] + 1))
            & (x["t"] > acc["t"])
        )
        return F.when(
            hit,
            F.struct((acc["d"] + 1).cast("int").alias("d"), x["t"].alias("t")),
        ).otherwise(acc)

    return ev.groupBy(user_col).agg(
        F.aggregate(evs, init, advance)["d"].alias("funnel_depth")
    )


@query(
    "q85_event_funnel",
    oracle="""
    WITH t1 AS (
        SELECT user_id, MIN(ts) AS ts1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e JOIN t1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN ts3 IS NOT NULL THEN 3
                     WHEN ts2 IS NOT NULL THEN 2
                     WHEN ts1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_depth
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN t1 USING (user_id)
    LEFT JOIN t2 USING (user_id)
    LEFT JOIN t3 USING (user_id)
    ORDER BY u.user_id
    """,
)
def q85_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel depth (view → click → purchase, strictly ordered
    in event time) per user — the product-analytics staple next to q78's
    transition matrix. One user-keyed shuffle + a Catalyst-lambda state
    machine; the oracle runs the independent 3-stage min-cascade
    formulation, so agreement cross-checks the algorithm, not just the
    arithmetic. See :func:`funnel`."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    return funnel(ev, steps=("view", "click", "purchase")).orderBy("user_id")


@query(
    "q93_session_paths",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:8], '>'
               ) AS path
        FROM sess GROUP BY user_id, session_id
    ),
    counts AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
    )
    SELECT path, n_sessions FROM counts
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q93_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-journey paths: q20's gaps-and-islands sessionization,
    each session rendered as its first-8-event-type path string, counted
    corpus-wide — the "what do sessions actually look like" report next
    to q85's fixed funnel (q85 asks "how far along MY funnel"; this asks
    "which funnels exist").

    Shape: ONE user-keyed exchange carries the lag window, the running
    session sum, and the per-session path build (array_sort over the
    collected (ts, event_id, type) structs — partial aggregation ships
    task slices); then one path-keyed count with map-side combine and a
    TakeOrderedAndProject top-k. Paths truncate at 8 steps so the group
    key is bounded regardless of session length.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > 1800),
        1,
    ).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(wf).cast("long")
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("i"),
                        F.col("event_type").alias("e"),
                    )
                )
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">", F.slice(F.transform("evs", lambda x: x["e"]), 1, 8)
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    # top-k as orderBy+limit -> TakeOrderedAndProject: per-partition heaps
    # merged on the driver, never a single-partition rank window (the path
    # space is |event_types|^8-bounded, not corpus-bounded, but still
    # nothing one task should sort alone)
    return counts.orderBy(F.col("n_sessions").desc(), "path").limit(20)


#: step string -> date_trunc unit. One-unit steps only: the grid must be
#: closed under date_trunc (every observation's bucket lands ON the grid),
#: which holds exactly when the step equals one trunc unit.
_STEP_UNITS = {
    "1 minute": "minute",
    "1 hour": "hour",
    "1 day": "day",
    "1 week": "week",
}

#: validated interval literal for max_span (spliced into F.expr)
_SPAN_RE = re.compile(r"^\d+ (?:minute|hour|day|week)s?$")


def resample_ffill(
    ev: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    id_col: str = "event_id",
    max_span: str | None = None,
) -> DataFrame:
    """Resample an irregular per-entity time series onto a regular grid
    with forward fill — the gap-filling step dashboards and feature
    pipelines need (Spark has no native ``resample``; pandas' is
    single-node). For each entity: one row per ``step`` between its first
    and last observation, carrying the last-observed value at or before
    that grid point, plus whether the point was observed or filled.

    ``step`` is any of ``1 minute | 1 hour | 1 day | 1 week`` (one
    ``date_trunc`` unit, so observations always land on the grid).
    ``id_col`` is the within-bucket tiebreaker for the closing
    observation (latest ts wins; equal ts resolved by highest id).

    ``max_span`` makes the grid-explosion contract ENFORCEABLE instead of
    a docstring warning: an interval literal (e.g. ``"30 days"``) that
    clamps each entity's grid end to ``first_obs + max_span``. A
    pathological entity (years of history at minute grain) is clamped,
    not exploded, and the output gains a per-row ``clamped`` boolean
    flagging affected entities so callers can route them to a coarser
    grain.

    Spark-first shape: ONE entity-keyed exchange serves everything — the
    per-bucket "closing" observation (a bucket-keyed aggregate choosing
    the max-(ts, id) row), the per-entity bounds, the grid explosion
    (``sequence`` + ``explode``, narrow, grid rows are generated in the
    task that owns the entity), the grid⋈observed join, and the
    forward-fill window (``last(ignorenulls)`` over rows-unbounded-
    preceding).
    """
    unit = _STEP_UNITS.get(step)
    if unit is None:
        raise ValueError(
            f"resample_ffill step must be one of {sorted(_STEP_UNITS)}, got {step!r}"
        )
    if max_span is not None and not _SPAN_RE.match(max_span):
        raise ValueError(f"max_span must look like '30 days', got {max_span!r}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    ev2 = ev.select(
        F.col(user_col),
        bucket.alias("bucket"),
        F.col(ts_col),
        F.col(id_col).alias("__tie"),
        F.col(value_col),
    )
    w_close = Window.partitionBy(user_col, "bucket").orderBy(
        F.col(ts_col).desc(), F.col("__tie").desc()
    )
    closing = (
        ev2.withColumn("__rn", F.row_number().over(w_close))
        .where(F.col("__rn") == 1)
        .select(user_col, "bucket", F.col(value_col).alias("__v"))
    )
    bounds = ev2.groupBy(user_col).agg(
        F.min("bucket").alias("__h0"), F.max("bucket").alias("__h1")
    )
    if max_span is not None:
        cap = F.col("__h0") + F.expr(f"INTERVAL {max_span}")
        bounds = bounds.select(
            user_col,
            "__h0",
            F.least("__h1", cap).alias("__h1"),
            (F.col("__h1") > cap).alias("clamped"),
        )
    grid_cols = [
        F.col(user_col),
        F.explode(
            F.sequence("__h0", "__h1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    ]
    if max_span is not None:
        grid_cols.append(F.col("clamped"))
    grid = bounds.select(*grid_cols)
    w_ff = (
        Window.partitionBy(user_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [
        F.col(user_col),
        F.col("bucket"),
        F.last("__v", ignorenulls=True).over(w_ff).alias("value_ff"),
        F.col("__v").isNotNull().alias("observed"),
    ]
    if max_span is not None:
        out_cols.append(F.col("clamped"))
    return grid.join(closing, [user_col, "bucket"], "left").select(*out_cols)


@query(
    "q97_resample_ffill",
    oracle="""
    WITH ev AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value
        FROM events WHERE user_id < 10
    ),
    hourly AS (
        SELECT user_id, bucket, value AS v FROM (
            SELECT user_id, bucket, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, bucket
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM ev
        ) WHERE rn = 1
    ),
    bounds AS (
        SELECT user_id, MIN(bucket) AS h0, MAX(bucket) AS h1
        FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
    )
    SELECT g.user_id, g.bucket,
           last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ff,
           h.v IS NOT NULL AS observed
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.bucket = g.bucket
    ORDER BY g.user_id, g.bucket
    """,
)
def q97_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: users 0-9's event values forward-filled
    onto each user's hourly grid (observed flag distinguishes real points
    from fills) — the gap-filling primitive next to q19's as-of join (as-of
    aligns two series; this regularizes one). See :func:`resample_ffill`."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    return resample_ffill(ev).orderBy("user_id", "bucket")


@query(
    "q99_resample_daily",
    oracle="""
    WITH ev AS (
        SELECT user_id, date_trunc('day', ts) AS bucket, ts, event_id, value
        FROM events WHERE user_id < 100
    ),
    daily AS (
        SELECT user_id, bucket, value AS v FROM (
            SELECT user_id, bucket, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, bucket
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM ev
        ) WHERE rn = 1
    ),
    bounds AS (
        SELECT user_id, MIN(bucket) AS h0, MAX(bucket) AS h1
        FROM ev GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(h0, h1, INTERVAL 1 DAY)) AS bucket
        FROM bounds
    )
    SELECT g.user_id, g.bucket,
           last_value(d.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ff,
           d.v IS NOT NULL AS observed
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.bucket = g.bucket
    ORDER BY g.user_id, g.bucket
    """,
)
def q99_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q97 at a second grain: users 0-99's values forward-filled onto a
    DAILY grid — exercises resample_ffill's step/date_trunc unit mapping
    end-to-end against the oracle (the r5 VERDICT ask: the operator must
    not be single-grain). See :func:`resample_ffill`."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    return resample_ffill(ev, step="1 day").orderBy("user_id", "bucket")


@query(
    "q98_cohort_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohorts GROUP BY cohort_week
    ),
    ret AS (
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INT)
                   AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM activity a JOIN cohorts c USING (user_id)
        GROUP BY c.cohort_week, week_offset
    )
    SELECT r.cohort_week, r.week_offset, s.cohort_size, r.n_active,
           CAST(r.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
               AS retention_rate
    FROM ret r JOIN sizes s USING (cohort_week)
    ORDER BY r.cohort_week, r.week_offset
    """,
)
def q98_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, and
    for each (cohort, week-offset) the count and share of the cohort still
    active — the product-analytics staple next to q85's funnel and q93's
    paths. Week offsets are exact integer day-diffs / 7; the rate is one
    IEEE division of int64s.

    Shape: a user-keyed aggregate builds cohorts, the distinct
    (user, week) activity reuses the same user-keyed exchange for the
    cohort join, then one (cohort, offset)-keyed count; cohort sizes ride
    a window-free broadcast-sized join (weeks are bounded by calendar
    time, not corpus size)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    ret = (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "n_active",
            (
                F.col("n_active").cast("double") / F.col("cohort_size").cast("double")
            ).alias("retention_rate"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def seasonal_anomalies(
    ev: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    n_sigma: float = 2.0,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: each observation is compared
    against the mean/σ of its OWN seasonal slot — (key, hour-of-day) — and
    flagged when it deviates more than ``n_sigma`` standard deviations.
    The time-series counterpart of q86's global MAD outliers: a value
    that's normal at peak hour is anomalous at 3am, which a global
    baseline can't see.

    Null values are excluded up front (the baseline and the flags both
    contract on non-null observations). Deterministic across engines: the
    two moments ride exact DECIMAL(38,6) sums, the variance is composed
    with one fixed expression order (``E[x²] − mean²``, clamped at 0
    before the IEEE ``sqrt``), so mean/σ are bit-identical.

    Shape (the q90 discipline): ONE (key, hour)-keyed exchange serves
    both moment windows and the per-row deviation test — no join-back, no
    second scan. Returns only the anomalous rows
    ``(event_id, key, hod, value, slot_mean, slot_sigma, slot_n)``.
    """
    dec = "decimal(38,6)"
    v = F.col(value_col)
    base = ev.where(v.isNotNull() & F.col(ts_col).isNotNull()).select(
        "event_id",
        F.col(key_col).alias("key"),
        F.hour(ts_col).cast("int").alias("hod"),
        v.alias("value"),
    )
    w = Window.partitionBy("key", "hod")
    n = F.count("value").over(w)
    mean = F.sum(F.col("value").cast(dec)).over(w).cast("double") / n
    ex2 = (
        F.sum((F.col("value") * F.col("value")).cast(dec)).over(w).cast("double") / n
    )
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))
    sigma = F.sqrt(var)
    return (
        base.select(
            "event_id",
            "key",
            "hod",
            "value",
            mean.alias("slot_mean"),
            sigma.alias("slot_sigma"),
            n.cast("long").alias("slot_n"),
        )
        .where(F.abs(F.col("value") - F.col("slot_mean")) > n_sigma * F.col("slot_sigma"))
    )


@query(
    "q104_seasonal_anomaly",
    oracle="""
    WITH base AS (
        SELECT event_id, event_type AS key, CAST(hour(ts) AS INT) AS hod, value
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    scored AS (
        SELECT event_id, key, hod, value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS slot_mean,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS ex2,
               CAST(COUNT(value) OVER w AS BIGINT) AS slot_n
        FROM base
        WINDOW w AS (PARTITION BY key, hod)
    )
    SELECT event_id, key, hod, value, slot_mean,
           sqrt(GREATEST(ex2 - slot_mean * slot_mean, 0.0)) AS slot_sigma,
           slot_n
    FROM scored
    WHERE abs(value - slot_mean) > 2.0 * sqrt(GREATEST(ex2 - slot_mean * slot_mean, 0.0))
    ORDER BY event_id
    """,
)
def q104_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events deviating >2σ from their (event_type, hour-of-day) seasonal
    baseline — the slot-conditional anomaly detector next to q86's global
    MAD outliers. See :func:`seasonal_anomalies`."""
    ev = load_table(spark, sf_dir, "events")
    return seasonal_anomalies(ev).orderBy("event_id")


def trend_slopes(
    ev: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key least-squares trend of ``value`` over time — the
    "is this metric drifting" primitive (slope per user/sensor/source) in
    engine-exact form. Equivalent to SQL ``regr_slope``, but quantized to
    EXACT integer moment sums (the surprisal/BM25 discipline) so results
    are bit-identical across engines, hardware, and summation order —
    built-in ``regr_slope`` accumulates doubles in partition order, and
    even DECIMAL-sum formulations diverge cross-engine once the cast of
    an arbitrary product double to DECIMAL has to round (measured: Spark
    and DuckDB land on different sides of a scale-6 rounding boundary).

    Quantization contract: x = milli-hours since the key's FIRST
    observation (``(ms − min_ms) div 3600`` — exact integer, 3.6 s
    resolution), y = value at centi-resolution (``round(100·y)``). The
    four moment sums Σx Σy Σxy Σx² are int64-exact and < 2^53 while
    per-key spans stay under ~1 month × ~10⁴ observations (past that,
    coarsen the quantization; plan shape unchanged). The finish is pure
    IEEE arithmetic on exactly-representable integers — identical in
    any IEEE-754 engine:
    ``slope = (Sxy − Sx·Sy/n) / (Sxx − Sx²/n)``, rescaled to value
    units per hour; ``intercept`` is the fitted value at the key's first
    observation. Null values excluded up front; zero-x-variance keys
    dropped (a vertical line has no slope).

    Shape: ONE key-keyed exchange — the min window and the final
    aggregation share the partitioning (the q90 discipline). Returns
    ``(key, n, slope_per_hour, intercept)``.
    """
    base = ev.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.unix_millis(ts_col).alias("ms"),
        F.col(value_col).alias("y"),
    )
    w = Window.partitionBy("key")
    quant = base.select(
        "key",
        F.expr("(ms - MIN(ms) OVER (PARTITION BY key)) div 3600").alias("xq"),
        F.round(F.col("y") * 100, 0).cast("long").alias("yq"),
    )
    agg = quant.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("__sx"),
        F.sum("yq").cast("long").alias("__sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("__sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("__sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy, sxx = F.col("__sxy").cast("double"), F.col("__sxx").cast("double")
    num = sxy - sx * sy / nd
    den = sxx - sx * sx / nd
    # units: yq per xq = centi-value per milli-hour -> value/hour = ×10
    slope = num / den * F.lit(10.0)
    # fitted value at x=0 (the key's first observation), in value units
    intercept = sy / nd / F.lit(100.0) - slope * (sx / nd / F.lit(1000.0))
    return (
        agg.where(den != F.lit(0.0))
        .select(
            "key",
            "n",
            slope.alias("slope_per_hour"),
            intercept.alias("intercept"),
        )
    )


@query(
    "q105_trend_slope",
    oracle="""
    WITH base AS (
        SELECT user_id AS key, epoch_ms(ts) AS ms, value AS y
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    quant AS (
        SELECT key,
               (ms - MIN(ms) OVER (PARTITION BY key)) // 3600 AS xq,
               CAST(round(y * 100, 0) AS BIGINT) AS yq
        FROM base
    ),
    agg AS (
        SELECT key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xq) AS BIGINT) AS sx,
               CAST(SUM(yq) AS BIGINT) AS sy,
               CAST(SUM(xq * yq) AS BIGINT) AS sxy,
               CAST(SUM(xq * xq) AS BIGINT) AS sxx
        FROM quant GROUP BY key
    ),
    fit AS (
        SELECT key, n,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   * 10.0 AS slope_per_hour,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS sxn,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS syn,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS den
        FROM agg
    )
    SELECT key, n, slope_per_hour,
           syn / 100.0 - slope_per_hour * (sxn / 1000.0) AS intercept
    FROM fit WHERE den <> 0.0
    ORDER BY key
    """,
)
def q105_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares value-over-time trend (slope per hour +
    intercept at first observation), from exact decimal sums of centered
    products — the drift detector next to q104's slot anomalies. See
    :func:`trend_slopes`."""
    ev = load_table(spark, sf_dir, "events")
    return trend_slopes(ev).orderBy("key")


def scd2_intervals(
    ev: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval history from an event
    log: for each key, the timeline of ``state_col`` values collapsed into
    ``(key, state, valid_from, valid_to)`` rows — consecutive repeats of
    the same state merge into one interval, ``valid_to`` is NULL for the
    current state. The versioned-dimension builder every warehouse
    ingest needs, as a pure window computation (no self-join, no MERGE
    machinery).

    Total order within a key is ``(ts, tiebreak)`` so equal-timestamp
    events resolve deterministically; rows with a NULL timestamp or
    tiebreak are excluded up front (engines disagree on NULL sort
    placement, so they cannot participate in an ordered timeline).
    Shape: ONE key-keyed exchange
    serves both windows — ``lag`` to detect state changes, ``lead``
    (after the change filter) to close each interval at the next change's
    start. Change detection is null-safe (``<=>``), so NULL states form
    intervals like any other value.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        ev.where(F.col(ts_col).isNotNull() & F.col(tiebreak_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("__ts"),
            F.col(tiebreak_col).alias("__tie"),
        )
        .withColumn("__prev", F.lag("state").over(
            Window.partitionBy("key").orderBy("__ts", "__tie")
        ))
        .withColumn("__first", F.row_number().over(
            Window.partitionBy("key").orderBy("__ts", "__tie")
        ) == 1)
        .where(F.col("__first") | ~F.col("state").eqNullSafe(F.col("__prev")))
    )
    w2 = Window.partitionBy("key").orderBy("__ts", "__tie")
    return changes.select(
        "key",
        "state",
        F.col("__ts").alias("valid_from"),
        F.lead("__ts").over(w2).alias("valid_to"),
    )


@query(
    "q109_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id AS key, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WHERE ts IS NOT NULL AND event_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT key, state, ts, event_id FROM ordered
        WHERE rn = 1 OR state IS DISTINCT FROM prev
    )
    SELECT key, state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY key ORDER BY ts, event_id) AS valid_to
    FROM changes
    ORDER BY key, valid_from, state
    """,
)
def q109_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD interval history of each user's event_type state —
    consecutive repeats collapsed, open interval for the current state.
    See :func:`scd2_intervals`."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_intervals(ev).orderBy("key", "valid_from", "state")


def seasonal_baseline(
    ev: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The (key, hour-of-day) slot baseline of :func:`seasonal_anomalies`
    as a standalone aggregate — same exact-decimal moments, same clamped
    variance, identical bits — so it can be computed in batch and joined
    against a LIVE stream (:func:`flag_against_baseline`): the
    train-offline / score-online split. Returns
    ``(key, hod, slot_mean, slot_sigma, slot_n)``.
    """
    dec = "decimal(38,6)"
    v = F.col(value_col)
    agg = (
        ev.where(v.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.hour(ts_col).cast("int").alias("hod"),
        )
        .agg(
            F.count(value_col).alias("__n"),
            F.sum(v.cast(dec)).cast("double").alias("__s1"),
            F.sum((v * v).cast(dec)).cast("double").alias("__s2"),
        )
    )
    mean = F.col("__s1") / F.col("__n")
    ex2 = F.col("__s2") / F.col("__n")
    return agg.select(
        "key",
        "hod",
        mean.alias("slot_mean"),
        F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0))).alias("slot_sigma"),
        F.col("__n").cast("long").alias("slot_n"),
    )


def flag_against_baseline(
    ev: DataFrame,
    baseline: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    n_sigma: float = 2.0,
) -> DataFrame:
    """Score observations against a precomputed :func:`seasonal_baseline`
    — works UNCHANGED under ``readStream`` (the join is stream–static,
    fully streamable in append mode; the baseline broadcasts, so the
    stream never shuffles). Batch form on the same frame reproduces
    :func:`seasonal_anomalies` exactly. Returns the anomalous rows with
    the same columns as :func:`seasonal_anomalies`.
    """
    v = F.col(value_col)
    base = ev.where(v.isNotNull() & F.col(ts_col).isNotNull()).select(
        "event_id",
        F.col(key_col).alias("key"),
        F.hour(ts_col).cast("int").alias("hod"),
        v.alias("value"),
    )
    return base.join(F.broadcast(baseline), ["key", "hod"]).where(
        F.abs(F.col("value") - F.col("slot_mean")) > n_sigma * F.col("slot_sigma")
    ).select("event_id", "key", "hod", "value", "slot_mean", "slot_sigma", "slot_n")


@query(
    "q120_pit_join",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id AS key, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WHERE ts IS NOT NULL AND event_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT key, state, ts AS valid_from FROM ordered
        WHERE rn = 1 OR state IS DISTINCT FROM prev
    ),
    versions AS (
        SELECT key, valid_from, MAX(state) AS state
        FROM changes GROUP BY key, valid_from
    ),
    facts AS (
        SELECT user_id AS key, event_id,
               ts + INTERVAL 30 MINUTE AS fts, value
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
    ),
    j AS (
        SELECT f.event_id, f.value, v.state,
               ROW_NUMBER() OVER (
                   PARTITION BY f.event_id ORDER BY v.valid_from DESC
               ) AS rn
        FROM facts f JOIN versions v
          ON f.key = v.key AND v.valid_from <= f.fts
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           {davg_sql('value', 'avg_value')}
    FROM j WHERE rn = 1
    GROUP BY state ORDER BY state
    """,
)
def q120_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — the feature-store-correctness query: each
    fact (an event observed 30 minutes after its timestamp) is joined to
    the dimension version that was CURRENT at observation time, never a
    later one (no feature leakage). Composition of two engine
    primitives: :func:`scd2_intervals` builds the version history,
    :func:`operators.relational.asof_join` resolves each fact with ONE
    key-keyed shuffle (union+window — never the O(n·m) interval join the
    oracle runs). Versions are pre-deduped to unique (key, valid_from)
    (max-state, deterministic) per the as-of contract. Exact-decimal
    means."""
    from reactive_kinesis_spark.functions import davg

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    dim = (
        scd2_intervals(ev)
        .groupBy("key", "valid_from")
        .agg(F.max("state").alias("state"))
    )
    facts = ev.select(
        F.col("user_id").alias("key"),
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("fts"),
        "value",
    )
    pit = asof_join(
        facts,
        dim,
        key="key",
        right_key="key",
        left_time="fts",
        right_time="valid_from",
        right_value_cols=["state"],
    )
    return (
        pit.groupBy("state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            davg("value", "avg_value"),
        )
        .orderBy("state")
    )


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point detection per group over an ordered integer
    series — the max-CUSUM-deviation statistic (the counting-process
    form of a Pettitt/KS split test): for a series x_1..x_m the
    candidate split i maximizes ``D_i = |m·S_i − i·S_m|`` (S = prefix
    sum), i.e. "where does the cumulative curve bow furthest from the
    straight line". The "did behavior shift, and when" primitive next
    to q104's slot anomalies and q105's trends — a level shift that a
    global mean or a linear trend both blur out.

    Exactness contract: ``value_col`` must be integer-exact (counts, or
    pre-quantized values — the trend_slopes discipline); then D_i,
    prefix sums, and totals are all int64 arithmetic, and the reported
    ``cusum_stat = D/(m·S_m)``, ``mean_before = S_i/i``,
    ``mean_after = (S_m−S_i)/(m−i)`` are single IEEE divisions of
    exactly-representable integers — bit-identical across engines with
    no quantization tricks. Splits are interior only (``i < m``: both
    sides non-empty, no division-by-zero edge); ties on D break to the
    EARLIEST split; single-row groups are dropped (no interior split);
    a group whose values sum to exactly 0 reports a NULL ``cusum_stat``
    (the m·S_m normalizer vanishes — undefined, not "no change").

    Shape: ONE group-keyed exchange serves the prefix-sum window, the
    row-number, and the group totals; the argmax is a struct-min
    aggregate on the same partitioning — no join-back, no second
    shuffle (the q90 discipline). ``order_col`` must be unique within a
    group (pre-bucketed series).

    Returns ``(*group_cols, change_point, cusum_stat, mean_before,
    mean_after)``.
    """
    w_seq = Window.partitionBy(*group_cols).orderBy(order_col)
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(*group_cols)
    cur = df.select(
        *group_cols,
        F.col(order_col).alias("__t"),
        F.sum(F.col(value_col).cast("long")).over(w_cum).alias("__cum"),
        F.row_number().over(w_seq).cast("long").alias("__i"),
        F.sum(F.col(value_col).cast("long")).over(w_all).alias("__total"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("__m"),
    )
    cand = cur.where(F.col("__i") < F.col("__m")).withColumn(
        "__d",
        F.abs(F.col("__m") * F.col("__cum") - F.col("__i") * F.col("__total")),
    )
    best = cand.groupBy(*group_cols).agg(
        F.min(
            F.struct(
                (-F.col("__d")).alias("nd"),
                F.col("__t").alias("t"),
                F.col("__cum").alias("cum"),
                F.col("__i").alias("i"),
                F.col("__total").alias("total"),
                F.col("__m").alias("m"),
            )
        ).alias("__b")
    )
    b = F.col("__b")
    # a group whose values sum to exactly 0 has no normalizer for the
    # statistic (m·S_m = 0 ⇒ ANSI DIVIDE_BY_ZERO): NULL — undefined,
    # not "no change" (with signed values D can be nonzero at S_m = 0)
    return best.select(
        *group_cols,
        b["t"].alias("change_point"),
        F.when(
            b["total"] != 0, (-b["nd"]) / (b["m"] * b["total"])
        ).alias("cusum_stat"),
        (b["cum"] / b["i"]).alias("mean_before"),
        ((b["total"] - b["cum"]) / (b["m"] - b["i"])).alias("mean_after"),
    )


@query(
    "q128_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, user_id % 25 AS cohort, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, cohort, day
    ),
    c AS (
        SELECT event_type, cohort, day,
               CAST(SUM(x) OVER wc AS BIGINT) AS cum,
               CAST(ROW_NUMBER() OVER ws AS BIGINT) AS i,
               CAST(SUM(x) OVER wa AS BIGINT) AS total,
               CAST(COUNT(*) OVER wa AS BIGINT) AS m
        FROM daily
        WINDOW ws AS (PARTITION BY event_type, cohort ORDER BY day),
               wc AS (PARTITION BY event_type, cohort ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY event_type, cohort)
    ),
    cand AS (
        SELECT *, ABS(m * cum - i * total) AS d FROM c WHERE i < m
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type, cohort ORDER BY d DESC, day ASC) AS rn
        FROM cand
    )
    SELECT event_type, cohort, day AS change_point,
           CASE WHEN total <> 0 THEN d / (m * total) END AS cusum_stat,
           cum / i AS mean_before,
           (total - cum) / (m - i) AS mean_after
    FROM r WHERE rn = 1
    ORDER BY event_type, cohort
    """,
)
def q128_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, user-cohort) change-point over daily event
    counts: the day where the cumulative count curve bows furthest from
    uniform, with before/after daily means — "which cohorts shifted
    behavior, and when". Integer CUSUM arithmetic end-to-end, so the
    report hash-certifies with no quantization. See
    :func:`cusum_changepoints`."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.col("user_id") % 25).alias("cohort"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    out = cusum_changepoints(daily, ["event_type", "cohort"], "day", "x")
    return out.orderBy("event_type", "cohort")


@query(
    "q132_attribution",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS source,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER w AS src_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    attr AS (
        SELECT source, us - src_us AS lag_us
        FROM o
        WHERE event_type = 'purchase' AND source IS NOT NULL
          AND us - src_us <= 3600000000
    ),
    agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_attributed,
               CAST(SUM(lag_us) AS BIGINT) AS sum_lag_us
        FROM attr GROUP BY source
    )
    SELECT source, n_attributed,
           n_attributed / CAST(SUM(n_attributed) OVER () AS BIGINT) AS share,
           sum_lag_us / (n_attributed * 1000000) AS avg_lag_sec
    FROM agg ORDER BY source
    """,
)
def q132_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the user's most recent NON-purchase event within the preceding
    hour; report per-source conversion counts, share of attributed
    purchases, and mean source→purchase latency — the marketing/funnel
    companion to q85's ordered funnel and q78's transitions.

    Exactness: the "most recent prior touch" is one ``last(...,
    ignorenulls)`` over a ``(ts, event_id)``-ordered frame ending at 1
    PRECEDING (the unique event_id tie-break makes the frame order
    total); lags live in integer microseconds; share and mean latency
    are single IEEE divisions of int64-exact counts/sums — the
    integer-division certification class. The share denominator is a
    window sum over the handful of grouped rows — no second scan, no
    driver scalar.

    Shape: ONE user-keyed sort-window exchange + one small aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    non_purchase_us = F.when(
        F.col("event_type") != "purchase", F.unix_micros("ts")
    )
    o = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(non_purchase, ignorenulls=True).over(w).alias("source"),
        F.last(non_purchase_us, ignorenulls=True).over(w).alias("src_us"),
    )
    attr = o.where(
        (F.col("event_type") == "purchase")
        & F.col("source").isNotNull()
        & (F.col("us") - F.col("src_us") <= 3600 * 1000 * 1000)
    ).select("source", (F.col("us") - F.col("src_us")).alias("lag_us"))
    agg = attr.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_attributed"),
        F.sum("lag_us").cast("long").alias("sum_lag_us"),
    )
    w_all = Window.partitionBy()
    return agg.select(
        "source",
        "n_attributed",
        (
            F.col("n_attributed")
            / F.sum("n_attributed").over(w_all).cast("long")
        ).alias("share"),
        (F.col("sum_lag_us") / (F.col("n_attributed") * 1000000)).alias(
            "avg_lag_sec"
        ),
    ).orderBy("source")


@query(
    "q134_interarrival_burstiness",
    oracle="""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    gaps AS (
        SELECT user_id, (us - prev_us) // 1000000 AS d
        FROM seq WHERE prev_us IS NOT NULL
    ),
    agg AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(d * d) AS BIGINT) AS sdd
        FROM gaps GROUP BY user_id
    ),
    m AS (
        SELECT user_id, n,
               sd / n AS mean_gap_sec,
               sqrt(GREATEST(
                   (n * sdd - sd * sd) / (CAST(n AS DOUBLE) * n), 0.0))
                   AS sigma_gap_sec
        FROM agg WHERE n >= 2
    )
    SELECT user_id, n, mean_gap_sec, sigma_gap_sec,
           CASE WHEN sigma_gap_sec + mean_gap_sec > CAST('0.0' AS DOUBLE)
           THEN (sigma_gap_sec - mean_gap_sec) / (sigma_gap_sec + mean_gap_sec)
           ELSE CAST('nan' AS DOUBLE) END AS burstiness
    FROM m
    ORDER BY user_id
    """,
)
def q134_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness ``B = (σ−μ)/(σ+μ)`` over
    whole-second event gaps — the traffic-shape profiler (−1 = metro-
    nome, 0 = Poisson, →1 = bursty) behind rate-limit tuning and bot
    detection; the arrival-process companion to q105's value trends.

    Exactness: gaps are integer seconds (floored micros — identical
    floor everywhere); Σd and Σd² are int64-exact, so the mean is one
    integer division and the variance is the single expression
    ``(n·Σd² − (Σd)²)/(n·n)`` on exactly-representable doubles, clamped
    at 0 before the IEEE sqrt (the q104 discipline). Requires n ≥ 2
    gaps; ``(ts, event_id)`` ordering is total.

    Shape: ONE user-keyed sort-window exchange; the lag, the gap
    filter, and the moment aggregation all ride it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    gaps = seq.where(F.col("prev_us").isNotNull()).select(
        "user_id",
        ((F.col("us") - F.col("prev_us")) / F.lit(1000000))
        .cast("long")
        .alias("d"),
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sd") / F.col("n")
    var = (F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")) / (nd * F.col("n"))
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    m = agg.where(F.col("n") >= 2).select(
        "user_id",
        "n",
        mean.alias("mean_gap_sec"),
        sigma.alias("sigma_gap_sec"),
    )
    # All-zero gaps (every event in the same second) collapse σ+μ to
    # exactly 0 — 0/0 would raise under ANSI; the indeterminate B is
    # reported as NaN (the q142/q143 degenerate convention).
    return m.select(
        "user_id",
        "n",
        "mean_gap_sec",
        "sigma_gap_sec",
        F.when(
            F.col("sigma_gap_sec") + F.col("mean_gap_sec") > F.lit(0.0),
            (F.col("sigma_gap_sec") - F.col("mean_gap_sec"))
            / (F.col("sigma_gap_sec") + F.col("mean_gap_sec")),
        )
        .otherwise(F.lit(float("nan")))
        .alias("burstiness"),
    ).orderBy("user_id")


@query(
    "q136_ewma_smoothing",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(
               list_prepend(CAST('0.0' AS DOUBLE),
                            list(value ORDER BY ts, event_id)),
               (acc, x) -> CAST('0.3' AS DOUBLE) * x
                           + CAST('0.7' AS DOUBLE) * acc
           ) AS ewma
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q136_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (α = 0.3, zero-seeded) — the "current level" smoother behind
    alerting baselines and engagement scores, and the sequential
    companion to q104's seasonal means: order matters, so no
    commutative aggregate can express it.

    Exactness: the q52 sequential-left-fold rule — Spark
    ``F.aggregate(array_sort(collect_list(...)), 0.0, acc·0.7 + x·0.3)``
    and DuckDB ``list_reduce(list_prepend(0.0, list(... ORDER BY ...)))``
    execute the SAME chain of IEEE mul/adds in the same order, so the
    doubles are bit-identical with no quantization. Float constants go
    through CAST('…' AS DOUBLE) (DuckDB parses bare literals as exact
    DECIMAL — the q107 teleport lesson). The ``(ts, event_id)`` sort key
    is total, so the fold order is unambiguous in both engines.

    Shape: ONE user-keyed shuffle; each user's history folds inside its
    own array (the q93 session-paths caveat — a 100 TB deployment runs
    the BOUNDED-STATE streaming twin continuously instead:
    :func:`reactive_kinesis_spark.streaming.windows.ewma_running_level`,
    two numbers of state per key via ``applyInPandasWithState``,
    stream≡batch bit-equality tested — and keeps this batch form for
    backfill/audit)."""
    ev = load_table(spark, sf_dir, "events")
    alpha, beta = F.lit(0.3), F.lit(0.7)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                F.lit(0.0),
                lambda acc, s: alpha * s["value"] + beta * acc,
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


@query(
    "q137_ks_test",
    oracle="""
    WITH cnt AS (
        SELECT value AS v, event_type AS t, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY v, t
    ),
    grid AS (
        SELECT vals.v, types.t, COALESCE(cnt.c, 0) AS c
        FROM (SELECT DISTINCT v FROM cnt) vals
        CROSS JOIN (SELECT DISTINCT t FROM cnt) types
        LEFT JOIN cnt ON cnt.v = vals.v AND cnt.t = types.t
    ),
    cum AS (
        SELECT v, t,
               CAST(SUM(c) OVER (PARTITION BY t ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_t,
               CAST(SUM(c) OVER (PARTITION BY t) AS BIGINT) AS n_t
        FROM grid
    ),
    cumall AS (
        SELECT v,
               CAST(SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_all,
               CAST(SUM(ca) OVER () AS BIGINT) AS n_all
        FROM (SELECT v, CAST(SUM(c) AS BIGINT) AS ca FROM cnt GROUP BY v)
    )
    SELECT cum.t AS event_type, cum.n_t AS n,
           CAST(cumall.n_all - cum.n_t AS BIGINT) AS n_rest,
           MAX(ABS(cum.cum_t / cum.n_t
                   - (cumall.cum_all - cum.cum_t)
                     / (cumall.n_all - cum.n_t))) AS ks_d
    FROM cum JOIN cumall ON cum.v = cumall.v
    WHERE cumall.n_all > cum.n_t
    GROUP BY cum.t, cum.n_t, cumall.n_all
    ORDER BY event_type
    """,
)
def q137_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-vs-rest two-sample Kolmogorov–Smirnov distance per
    event type: does this type's value distribution differ from the
    rest of the traffic? — the distribution-shift tripwire behind
    segment drift review, and the nonparametric companion to q125's
    binned TVD/chi-square (KS needs no binning choice).

    Exactness: the empirical CDFs are ratios of integer cumulative
    counts; each candidate D is two IEEE divisions and a subtraction
    on exactly-representable int64 values, and MAX over doubles is
    order-independent — hash-certified with no quantization. A type
    that constitutes the ENTIRE corpus has an empty rest-sample (KS
    undefined, and 0/0 raises under ANSI) — such types are dropped.

    Shape: events reduce to per-(value, type) counts FIRST (one
    shuffle); the step grid is distinct-values × types (bounded by the
    VALUE DOMAIN × a handful of types, not the event count — the q135
    distinct-value-frame rule), the per-type CDF windows partition by
    type, and the pooled-CDF window runs over the distinct-value frame
    only. The rest-CDF comes from (pooled − type), so one grid pass
    serves every type simultaneously."""
    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.groupBy(F.col("value").alias("v"), F.col("event_type").alias("t"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    vals = cnt.select("v").distinct()
    types = cnt.select("t").distinct()
    grid = (
        vals.crossJoin(F.broadcast(types))
        .join(cnt, ["v", "t"], "left")
        .select("v", "t", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_t = (
        Window.partitionBy("t")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "v",
        "t",
        F.sum("c").over(w_t).cast("long").alias("cum_t"),
        F.sum("c").over(Window.partitionBy("t")).cast("long").alias("n_t"),
    )
    valtot = cnt.groupBy("v").agg(F.sum("c").cast("long").alias("ca"))
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cumall = valtot.select(
        "v",
        F.sum("ca").over(w_all).cast("long").alias("cum_all"),
        F.sum("ca").over(Window.partitionBy()).cast("long").alias("n_all"),
    )
    d = (
        cum.join(cumall, "v")
        # a type that IS the whole corpus has no rest-sample to compare
        # against (n_rest = 0 ⇒ 0/0 under ANSI) — KS is undefined, drop it
        .where(F.col("n_all") > F.col("n_t"))
        .select(
            "t",
            "n_t",
            (F.col("n_all") - F.col("n_t")).cast("long").alias("n_rest"),
            F.abs(
                F.col("cum_t") / F.col("n_t")
                - (F.col("cum_all") - F.col("cum_t"))
                / (F.col("n_all") - F.col("n_t"))
            ).alias("d"),
        )
    )
    return (
        d.groupBy(F.col("t").alias("event_type"), F.col("n_t").alias("n"), "n_rest")
        .agg(F.max("d").alias("ks_d"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Round 11: funnel + cohort retention (product-analytics tier)
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@query(
    "q162_funnel_steps",
    oracle="""
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s1 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e
        JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
        WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e
        JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e
        JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    counts AS (
        SELECT 0 AS step, 'signup' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
        UNION ALL
        SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
        UNION ALL
        SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT CAST(step AS INT) AS step, step_name, n_users,
           CASE WHEN step = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(n_users AS DOUBLE)
                     / CAST(LAG(n_users) OVER (ORDER BY step) AS DOUBLE)
           END AS conv_from_prev,
           CAST(n_users AS DOUBLE)
           / CAST(FIRST_VALUE(n_users) OVER (
               ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) AS conv_overall
    FROM counts
    ORDER BY step
    """,
)
def q162_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → click → purchase: users
    reaching each step strictly after their earliest qualifying previous
    step, with step-over-step and overall conversion (exact counts, single
    divisions). The plan is one user-keyed min-agg per step chained by
    user-keyed joins — every wide stage reuses the same partitioning and
    no per-user event arrays are ever materialized. See
    :func:`operators.relational.funnel_steps`."""
    from reactive_kinesis_spark.operators.relational import funnel_steps

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(ev, _FUNNEL_STEPS).orderBy("step")


@query(
    "q163_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    ),
    j AS (
        SELECT a.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.aw) // 7 AS INT) AS week_offset
        FROM active a JOIN firsts f USING (user_id)
    ),
    cells AS (
        SELECT cohort_week, week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM j GROUP BY cohort_week, week_offset
    ),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    )
    SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
           CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
    FROM cells c JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def q163_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = ISO week of first event,
    one row per (cohort, active-week offset) with exact counts and one
    retention division. Week truncation (`date_trunc('week')`, ISO
    Monday) and day-diff // 7 offsets are engine-identical, so the whole
    matrix hash-certifies. See
    :func:`operators.relational.cohort_retention`."""
    from reactive_kinesis_spark.operators.relational import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev).orderBy("cohort_week", "week_offset")

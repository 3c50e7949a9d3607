"""Randomized-corpus differential: every oracle-backed query whose tables
are documents/events/embeddings is re-checked against DuckDB on SEEDED
random corpora with shapes the fixed testdata never exercises — exact
duplicate docs, single-word docs, hot-word concentration, idle and
hyperactive users, duplicate timestamps, multi-byte UTF-8 tokens. The fixed-corpus parity suite
proves the engines agree on one dataset; this proves the agreement is a
property of the queries, not the data (the q52 empty-list break was
exactly a data-shape hole)."""

from __future__ import annotations

import random

import duckdb
import pytest

pytestmark = pytest.mark.slow_e2e  # minute-scale e2e; skipped under SPARK_GRAFT_FAST_VERIFY=1


from reactive_kinesis_spark.queries import load_all
from tests.oracle_utils import compare

_TPCH = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

_WORDS = [
    "alpha", "beta", "gamma", "delta", "the", "a", "of", "scan", "table",
    "x1", "y2", "z3", "hot",
    # multi-byte UTF-8: pins char-vs-byte length semantics, UTF-8 md5,
    # and tokenizer/regex behavior across engines
    "café", "日本語", "emoji😀", "мир",
]
_LANGS = ["en", "de", "fr"]
_SOURCES = ["web", "books", "code"]
_EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]


def _gen_dir(spark, tmp_path, seed: int) -> str:
    rng = random.Random(seed)
    dst = str(tmp_path / f"rand_{seed}")

    docs = []
    for i in range(120):
        if i % 17 == 0 and docs:
            text = docs[rng.randrange(len(docs))][1]  # exact duplicate
        elif i % 23 == 0:
            text = rng.choice(_WORDS)  # single-word doc
        else:
            # zipf-ish: 'hot' dominates some docs
            n = rng.randint(2, 40)
            text = " ".join(
                "hot" if rng.random() < 0.3 else rng.choice(_WORDS)
                for _ in range(n)
            )
        docs.append((i, text, rng.choice(_LANGS), rng.choice(_SOURCES), len(text)))
    spark.createDataFrame(
        docs, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{dst}/documents.parquet")

    evs = []
    base = 1_700_000_000
    for i in range(600):
        uid = rng.choice([1, 1, 1, 2, 3, rng.randint(4, 30)])  # hyperactive + idle
        t = base + rng.randint(0, 200_000)
        if i % 31 == 0 and evs:
            t = evs[-1][1]  # duplicate timestamp
        evs.append((i, t, uid, rng.choice(_EVENT_TYPES), round(rng.uniform(0, 50), 2), '{"k": %d}' % rng.randint(0, 99)))
    (
        spark.createDataFrame(
            evs,
            schema="event_id long, tsec long, user_id long, event_type string, value double, props string",
        )
        .selectExpr(
            "event_id", "timestamp_seconds(tsec) AS ts", "user_id",
            "event_type", "value", "props",
        )
        .write.parquet(f"{dst}/events.parquet")
    )

    embs = []
    for i in range(80):
        vec = [rng.randint(-64, 64) / 64.0 for _ in range(8)]
        if i % 19 == 0 and embs:
            vec = list(embs[-1][1])  # exact duplicate vector
        embs.append((i, vec, rng.randint(0, 3)))
    spark.createDataFrame(
        embs, schema="vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{dst}/embeddings.parquet")
    return dst


def _gen_tpch(spark, rng: random.Random, dst: str) -> None:
    """Random TPC-H-ish tables with valid FKs, the documented schemas, and
    the testdata's value domains (so every query's literal filters stay
    selective rather than trivially empty): customers with zero orders,
    orders with 1-8 lineitems, duplicate balances, boundary discounts."""
    day = 86_400
    t0 = 789_000_000  # ~1995, inside every date filter's range

    spark.createDataFrame(
        [(i, n) for i, n in enumerate(["AFRICA", "AMERICA", "ASIA"])],
        schema="r_regionkey int, r_name string",
    ).write.parquet(f"{dst}/region.parquet")
    spark.createDataFrame(
        [(i, f"NATION_{i}", i % 3) for i in range(8)],
        schema="n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(f"{dst}/nation.parquet")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    spark.createDataFrame(
        [
            (
                i,
                f"Customer#{i:09d}",
                rng.randrange(8),
                round(rng.uniform(-900, 9900), 2),
                rng.choice(segs),
            )
            for i in range(40)
        ],
        schema="c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.parquet(f"{dst}/customer.parquet")
    spark.createDataFrame(
        [
            (i, f"Supplier#{i:09d}", rng.randrange(8), round(rng.uniform(0, 9000), 2))
            for i in range(10)
        ],
        schema="s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.parquet(f"{dst}/supplier.parquet")
    types = ["ECONOMY", "LARGE", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
    spark.createDataFrame(
        [
            (
                i,
                rng.choice(["cold", "small", "large"]) + " " + rng.choice(["widget", "bolt"]),
                f"Brand#{rng.randrange(1, 26)}",
                rng.choice(types),
                rng.randint(1, 50),
                round(900 + rng.uniform(0, 20), 2),
            )
            for i in range(25)
        ],
        schema="p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).write.parquet(f"{dst}/part.parquet")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = [
        (
            i,
            rng.randrange(30),  # customers 30-39 have zero orders
            rng.choice(["P", "O", "F"]),
            round(rng.uniform(1000, 400000), 2),
            t0 + rng.randint(0, 2000) * day,
            rng.choice(prios),
        )
        for i in range(120)
    ]
    spark.createDataFrame(
        orders,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_odate long, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "timestamp_seconds(o_odate) AS o_orderdate", "o_orderpriority",
    ).write.parquet(f"{dst}/orders.parquet")
    li = []
    for o in orders:
        for ln in range(rng.randint(1, 8)):
            li.append(
                (
                    o[0],
                    rng.randrange(25),
                    rng.randrange(10),
                    ln + 1,
                    float(rng.randint(1, 50)),
                    round(rng.uniform(900, 95000), 2),
                    rng.choice([0.0, 0.01, 0.05, 0.1]),  # boundary discounts
                    rng.choice([0.0, 0.04, 0.08]),
                    rng.choice(["N", "A", "R"]),
                    rng.choice(["O", "F"]),
                    o[4] + rng.randint(1, 90) * day,
                )
            )
    spark.createDataFrame(
        li,
        schema=(
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, l_sdate long"
        ),
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "timestamp_seconds(l_sdate) AS l_shipdate",
    ).write.parquet(f"{dst}/lineitem.parquet")


@pytest.mark.parametrize("seed", [20260814, 424242])
def test_oracle_parity_on_random_corpora(spark, tmp_path, seed):
    dst = _gen_dir(spark, tmp_path, seed)
    _gen_tpch(spark, random.Random(seed + 7), dst)
    con = duckdb.connect()
    try:
        for t in ("documents", "events", "embeddings") + _TPCH:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{dst}/{t}.parquet/*.parquet')"
            )
        reg = load_all()
        names = [n for n, qd in reg.items() if qd.oracle]
        assert len(names) >= 80  # the differential must cover the full surface
        failures = []
        for name in names:
            try:
                # require_rows=False: on RANDOM corpora an empty result is
                # a legitimate outcome (no near-dups, no contamination hits);
                # the non-degeneracy guard is a REAL-SF registry convention,
                # enforced by tests/test_oracle_parity.py
                compare(
                    reg[name].fn(spark, dst),
                    con,
                    reg[name].oracle,
                    require_rows=False,
                )
            except Exception as e:  # noqa: BLE001 — collect, report all at once
                failures.append(f"{name}: {type(e).__name__}: {str(e)[:300]}")
        assert not failures, "\n".join(failures)
    finally:
        con.close()

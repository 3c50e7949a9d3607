"""Randomized-corpus differential: every oracle-backed query whose tables
are documents/events/embeddings is re-checked against DuckDB on SEEDED
random corpora with shapes the fixed testdata never exercises — exact
duplicate docs, single-word docs, hot-word concentration, idle and
hyperactive users, duplicate timestamps. The fixed-corpus parity suite
proves the engines agree on one dataset; this proves the agreement is a
property of the queries, not the data (the q52 empty-list break was
exactly a data-shape hole)."""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from reactive_kinesis_spark.queries import load_all
from tests.oracle_utils import compare

_TPCH = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

_WORDS = [
    "alpha", "beta", "gamma", "delta", "the", "a", "of", "scan", "table",
    "x1", "y2", "z3", "hot",
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


def _eligible() -> list[str]:
    out = []
    for name, qd in load_all().items():
        if not qd.oracle:
            continue
        refs = set(re.findall(r"\b(" + "|".join(_TPCH) + r")\b", qd.oracle))
        if not refs:
            out.append(name)
    return out


@pytest.mark.parametrize("seed", [20260814, 424242])
def test_oracle_parity_on_random_corpora(spark, tmp_path, seed):
    dst = _gen_dir(spark, tmp_path, seed)
    con = duckdb.connect()
    try:
        for t in ("documents", "events", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{dst}/{t}.parquet/*.parquet')"
            )
        reg = load_all()
        names = _eligible()
        assert len(names) >= 40  # the differential must actually cover the surface
        failures = []
        for name in names:
            try:
                compare(reg[name].fn(spark, dst), con, reg[name].oracle)
            except Exception as e:  # noqa: BLE001 — collect, report all at once
                failures.append(f"{name}: {type(e).__name__}: {str(e)[:300]}")
        assert not failures, "\n".join(failures)
    finally:
        con.close()

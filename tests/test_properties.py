"""Property-based tests (hypothesis) — the engine analog of the reference's
ScalaCheck layer (SURVEY.md §5.3: payload round-trip over generated strings,
reference ConsumerEventSpec.scala:30-37), extended to the invariants that
actually protect the engine: pack/unpack inverse, exact-decimal aggregation,
and payload decode fidelity through a real DataFrame.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reactive_kinesis_spark.streaming.deaggregate import pack_records, unpack_records

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_records = st.lists(
    st.tuples(
        st.text(min_size=1, max_size=40),
        st.binary(min_size=0, max_size=200),
    ),
    min_size=0,
    max_size=20,
)


@settings(**_SETTINGS)
@given(_records)
def test_pack_unpack_is_identity(records):
    """KPL-style aggregate blob round-trips every (partition_key, payload)
    exactly, preserving order (reference parity: KCL deaggregation yields
    sub-records in packed order, ConsumerProcessingManager.scala:82-89)."""
    assert unpack_records(pack_records(records)) == records


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet=st.characters(codec="utf-8"), max_size=60), min_size=1, max_size=10))
def test_payload_string_roundtrip_through_dataframe(spark, payloads):
    """UTF-8 payload encode → BINARY column → payload_as_string decode is the
    identity (reference ConsumerEventSpec property, payloadAsString)."""
    from reactive_kinesis_spark.functions import payload_as_string

    df = spark.createDataFrame(
        [(i, p.encode("utf-8")) for i, p in enumerate(payloads)], "id long, payload binary"
    )
    out = df.select("id", payload_as_string("payload").alias("s")).collect()
    assert sorted((r.id, r.s) for r in out) == sorted(enumerate(payloads))


@settings(**_SETTINGS)
@given(
    st.lists(
        # doubles quantized to 6 dp within DECIMAL(38,6)'s comfortable range:
        # dsum must equal the exact decimal sum regardless of count/sign/order
        st.integers(min_value=-(10**12), max_value=10**12).map(lambda n: n / 1e6),
        min_size=1,
        max_size=50,
    )
)
def test_dsum_equals_exact_decimal_sum(spark, values):
    """The engine's numeric policy: dsum over doubles representable at 6 dp
    equals the exact Decimal sum, independent of aggregation order."""
    from pyspark.sql import functions as F

    from reactive_kinesis_spark.functions import dsum

    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(4)
    got = df.agg(dsum("v", "s")).collect()[0].s
    want = float(sum(Decimal(str(v)).quantize(Decimal("0.000001")) for v in values))
    assert got == want


def test_approx_percentiles_rank_error_bound(spark, sf_dir):
    """q73's contract: with accuracy=10000 the approx percentile of each
    group sits within rank n/10000 of the exact order statistic — at test
    SFs that means the approx value must fall between the exact quantiles
    at p ± 0.01 (generous cover for the ±n/10000-rank guarantee)."""
    from reactive_kinesis_spark.queries import load_all

    R = load_all()
    approx = {r.l_returnflag: r for r in R["q73_percentiles_approx"].fn(spark, sf_dir).collect()}
    from reactive_kinesis_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    bounds = (
        li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile({col}, {p}D)").alias(f"{name}_{tag}")
                for name, col, pc in (
                    ("p25", "l_quantity", 0.25),
                    ("p50", "l_quantity", 0.50),
                    ("p75", "l_quantity", 0.75),
                    ("price_p90", "l_extendedprice", 0.90),
                )
                for tag, p in (("lo", max(0.0, pc - 0.01)), ("hi", min(1.0, pc + 0.01)))
            ]
        )
        .collect()
    )
    assert approx
    for row in bounds:
        a = approx[row.l_returnflag]
        for name in ("p25", "p50", "p75", "price_p90"):
            lo, hi = getattr(row, f"{name}_lo"), getattr(row, f"{name}_hi")
            got = getattr(a, name)
            assert lo <= got <= hi, (row.l_returnflag, name, lo, got, hi)


def test_source_overlap_invariants(spark, sf_dir):
    """Structural invariants of the contamination matrix: intersection
    bounded by either side, jaccard in (0, 1], pairs ordered and unique."""
    from reactive_kinesis_spark.operators.text import source_overlap
    from reactive_kinesis_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = source_overlap(docs, n=3).collect()
    assert rows, "expected at least one overlapping source pair"
    seen = set()
    for r in rows:
        assert r.source_1 < r.source_2
        assert (r.source_1, r.source_2) not in seen
        seen.add((r.source_1, r.source_2))
        assert 0 < r.n_common <= min(r.n_1, r.n_2)
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard == r.n_common / (r.n_1 + r.n_2 - r.n_common)


def test_rare_word_scoring_invariants(spark, sf_dir):
    """rare_words never exceeds n_words; commonness_sum >= n_words (every
    word occurs at least once corpus-wide); ratios reconstruct exactly."""
    from reactive_kinesis_spark.operators.text import rare_word_scoring
    from reactive_kinesis_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    for r in rare_word_scoring(docs, rare_max_count=100).collect():
        assert 0 <= r.rare_words <= r.n_words
        assert r.commonness_sum >= r.n_words
        assert r.rare_ratio == r.rare_words / r.n_words
        assert r.mean_commonness == r.commonness_sum / r.n_words


def test_characteristic_terms_rank_contract(spark, sf_dir):
    """Within a doc, rn follows (tf desc, df asc, word asc) with no gaps."""
    from reactive_kinesis_spark.operators.text import characteristic_terms
    from reactive_kinesis_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    by_doc: dict[int, list] = {}
    for r in characteristic_terms(docs, k=3).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.tf, r.df, r.word) for r in rows]
        assert keys == sorted(keys)


def test_chunking_covers_every_token_and_respects_stride(spark):
    """Chunking contract: every token index is inside ≥1 chunk, chunk i
    starts at i·stride, consecutive chunks overlap by chunk-stride tokens,
    and degenerate docs (shorter than one window, single word) yield
    exactly one chunk equal to the document."""
    from reactive_kinesis_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(150))),  # 3 chunks @ 64/48
            (2, " ".join(f"u{i}" for i in range(64))),   # exactly one window
            (3, "single"),                                # sub-window doc
            (4, " ".join(f"v{i}" for i in range(65))),   # one full + one short
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=64, stride=48).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(by_doc) == [1, 2, 3, 4]
    assert [r.chunk_id for r in sorted(by_doc[1], key=lambda r: r.chunk_id)] == [0, 1, 2]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 64
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == "single"
    assert len(by_doc[4]) == 2 and by_doc[4][1].n_chunk_tokens == 65 - 48
    # coverage + overlap on the 150-token doc
    toks = [f"t{i}" for i in range(150)]
    seen: set[int] = set()
    for r in by_doc[1]:
        words = r.chunk_text.split(" ")
        start = r.chunk_id * 48
        assert words == toks[start : start + 64]
        seen.update(range(start, start + len(words)))
    assert seen == set(range(150))


def test_chunking_rejects_bad_stride(spark):
    import pytest

    from reactive_kinesis_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=8, stride=9)


@settings(**_SETTINGS)
@given(
    st.integers(min_value=-(1 << 113), max_value=(1 << 113)),
    st.integers(min_value=-(1 << 60), max_value=(1 << 60)).filter(lambda b: b != 0),
)
def test_tdiv_matches_sql_truncating_division(a, b):
    """_tdiv is the SQL // semantics on ANY signed pair: truncation
    toward zero (Python's // floors — off by one on every inexact
    mixed-sign quotient), pinned against the arithmetic definition over
    the full 128-bit range q189's deflation actually uses. Widened from
    b >= 1 in r13 (the r12 ADVICE finding: the helper silently assumed a
    positive divisor)."""
    from reactive_kinesis_spark.operators.similarity import _tdiv

    q = _tdiv(a, b)
    assert abs(q) == abs(a) // abs(b)
    assert q == 0 or (q < 0) == ((a < 0) != (b < 0))
    # |q*b| never overshoots |a|, and the remainder is inside [0, |b|)
    assert abs(q * b) <= abs(a) < abs(q * b) + abs(b)


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=(1 << 50)), st.integers(min_value=1, max_value=10))
def test_derive_lsh_params_cost_budget_invariant(n, bands):
    """The derived banding point always (a) floors at 3-bit bands, (b)
    caps at 24, (c) keeps the expected random-collision candidate count
    N·bands·2^-bits within 2× of the target whenever neither clamp is
    active — the flat-cost contract of the r12 scale derivation."""
    from reactive_kinesis_spark.operators.similarity import (
        ANN_TARGET_CANDIDATES,
        derive_lsh_params,
    )

    p = derive_lsh_params(n, bands=bands)
    bits = p["n_planes"] // bands
    assert p["bands"] == bands and p["n_planes"] == bits * bands
    assert 3 <= bits <= 24
    expected = n * bands / (2.0**bits)
    if 3 < bits < 24:
        assert expected <= ANN_TARGET_CANDIDATES * 2
        # one bit fewer would blow the budget — the derivation is tight
        assert n * bands / (2.0 ** (bits - 1)) > ANN_TARGET_CANDIDATES


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.integers(min_value=1, max_value=12),
    st.sampled_from(["zipf", "alt", "x:y"]),
)
def test_zipf_synth_docs_matches_duckdb_any_params(spark, tokens_per_doc, seed):
    """The synthetic corpus is bit-identical cross-engine for ANY
    (tokens_per_doc, seed) — not just the q186-q188 registry point:
    Spark conv/md5/div vs DuckDB hex-cast/md5/// on the same doc ids."""
    import duckdb

    from reactive_kinesis_spark.operators.lexstats import (
        ZIPF_SYNTH_RANGE,
        zipf_synth_docs,
    )

    df = spark.createDataFrame(
        [(i, "t", "en", "s") for i in (1, 2, 7, 40)],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        r.doc_id: r.text
        for r in zipf_synth_docs(df, tokens_per_doc=tokens_per_doc, seed=seed).collect()
    }
    word = (
        f"'w' || CAST({ZIPF_SYNTH_RANGE} // (CAST(('0x' || substr(md5("
        f"'{seed}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)"
        f"), 1, 12)) AS BIGINT) + 1) AS VARCHAR)"
    )
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT doc_id, array_to_string(list_transform(range(1, "
            f"{tokens_per_doc + 1}), i -> {word}), ' ') FROM (VALUES (1), (2), "
            f"(7), (40)) t(doc_id)"
        ).fetchall()
    )
    assert got == want


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=(1 << 50)))
def test_derive_ivf_cells_cost_budget_invariant(n):
    """The derived IVF point always (a) floors at 16 cells, (b) keeps
    the expected per-probe-set candidate count n_probe·N/cells within
    [target/2·n_probe, 2·target·n_probe] whenever the floor is not
    active — the flat-cost contract of the r14 derivation (the q195
    twin of the LSH budget invariant above)."""
    from reactive_kinesis_spark.operators.similarity import (
        IVF_TARGET_CELL_SIZE,
        derive_ivf_cells,
    )

    cells = derive_ivf_cells(n)
    assert cells >= 16
    if cells > 16:  # off the floor: mean cell size within [1x, 2x) target
        assert IVF_TARGET_CELL_SIZE <= n / cells < 2 * IVF_TARGET_CELL_SIZE
    else:
        assert n < 17 * IVF_TARGET_CELL_SIZE

"""Text-analysis operators for LLM training-data pipelines.

All JVM-side (split/filter/transform array functions — no Python UDFs in the
hot path), so they run inside whole-stage codegen and scale linearly with
zero shuffle (per-row transforms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

#: Tiny per-language stopword lists for the heuristic language-ID operator.
#: Deterministic and engine-portable (the DuckDB oracle embeds the same sets).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "y", "es", "un"),
    "fr": ("le", "les", "et", "est", "une", "dans"),
}

QUALITY_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("int")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("int")


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = QUALITY_STOPWORDS) -> Column:
    """Count of stopword occurrences — array ``filter`` built-in, no UDF."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(text), lambda w: F.array_contains(arr, w))).cast("int")


def quality_score(text: Column | str) -> Column:
    """Deterministic document quality score in [0, 1]:
    0.4·min(1, tokens/100) + 0.3·distinct_ratio + 0.3·min(1, 4·stopword_ratio).

    The exact arithmetic shape is mirrored in the oracle SQL so both engines
    produce bit-identical doubles.
    """
    nt = token_count(text).cast("double")
    nd = distinct_token_count(text).cast("double")
    ns = stopword_count(text).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), nt / F.lit(100.0))
        + F.lit(0.3) * (nd / nt)
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(4.0) * (ns / nt))
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is engine-portable (identical hex in Spark and DuckDB), unlike
    xxhash64 — the fingerprint is the dedup/shard key for exact-dup removal
    at scale (hash-partitionable, no skew beyond true duplicates).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(c))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit scores for heuristic language ID."""
    return {lang: stopword_count(text, words) for lang, words in STOPWORDS.items()}


def predict_lang(text: Column | str) -> Column:
    """argmax over language scores, ties broken by language-code order;
    'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.lit("und")
    # reverse order so earlier langs win ties via later .when precedence
    expr = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        expr = expr.when(scores[lg] == best, F.lit(lg))
    return expr


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard per-document text statistics columns."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        distinct_token_count(text_col).alias("n_distinct_tokens"),
        quality_score(text_col).alias("quality_score"),
        fingerprint(text_col).alias("fingerprint"),
    )


#: GPT-2-style pretokenizer pattern, lookahead-free so it parses identically
#: under Java regex (Spark) and RE2 (DuckDB): contraction suffixes, then
#: space-prefixed letter / digit / punctuation runs, then whitespace runs.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish pretoken count (the unit LLM token budgets are measured in,
    before merges) — JVM-side ``regexp_extract_all``, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)).cast("int")


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic mixture resampling: downsample each ``group_col``
    group so the kept corpus approximates the target mix ``weights``
    (relative proportions; groups absent from ``weights`` are dropped).

    The total kept size is maximized subject to never up-sampling: with
    target share ``w_g`` and available count ``n_g``, the feasible total is
    ``K = min_g(n_g / w_g)`` and each group keeps ``rate_g = w_g·K / n_g``
    of its rows (the binding group keeps 100%). Selection is the same
    content-hash bucket rule as :func:`deterministic_sample` — first 4 md5
    hex digits under a per-group cutoff of ``floor(rate·65536)`` buckets —
    so the sample is a pure function of content + weights: reproducible
    across retries, engines (mirrored in the q65 oracle), and corpus
    *growth* (a doc's keep/drop never flips when other docs arrive, only
    the cutoffs move).

    Plan shape: one tiny per-group count aggregate, a scalar min, and a
    broadcast join of the per-group cutoffs back onto the corpus — the
    corpus itself is never shuffled, the filter is a narrow md5-compare.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, float(w)) for g, w in sorted(weights.items())], [group_col, "wt"]
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    gw = counts.join(wdf, group_col)  # inner: unweighted groups drop out
    kk = gw.agg(F.min(F.col("n_g").cast("double") / F.col("wt")).alias("kk"))
    cuts = (
        gw.crossJoin(F.broadcast(kk))
        .select(
            group_col,
            F.floor(
                F.least(
                    F.lit(1.0),
                    (F.col("wt") * F.col("kk")) / F.col("n_g").cast("double"),
                )
                * F.lit(65536.0)
            )
            .cast("int")
            .alias("cut"),
        )
    )
    keep = (F.col("cut") >= F.lit(65536)) | (
        F.substring(F.md5(F.col(text_col)), 1, 4)
        < F.lower(F.lpad(F.hex(F.col("cut")), 4, "0"))
    )
    return df.join(F.broadcast(cuts), group_col).where(keep).drop("cut")


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    partition_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a training shard by cumulative token budget:
    within each ``partition_cols`` group, documents are laid out in
    ``id_col`` order and a document goes to ``shard = floor(start / budget)``
    where ``start`` is the running token total before it (greedy sequential
    packing — a doc that straddles a boundary starts the next shard's
    overflow, it is never split).

    One shuffle (hash on ``partition_cols``) + an in-partition sort and
    running sum — the canonical window-cumsum shape. Each partition group is
    a single window task, so at 100 TB the caller bounds group size by
    packing within finer partitions (e.g. ``("lang", "ingest_day")``) —
    which is how production pipelines shard anyway; the layout stays
    deterministic because the order key is content-stable ids, never
    ``rand()``.

    Shard starts are exact: the running sum is integer (long), and the
    division floors a non-negative integer < 2^53, so the result is
    bit-identical across engines (mirrored in the q62 oracle).
    """
    from pyspark.sql import Window

    nt = bpe_token_count(text_col)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(*partition_cols, id_col, nt.alias("n_tokens"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return staged.withColumn(
        "shard", F.floor(start / F.lit(float(budget))).cast("int")
    )


def word_ngram_array(words: Column, n: int) -> Column:
    """All word ``n``-grams of a document INCLUDING duplicates (unlike
    ``dedup.shingles``, which is distinct-per-doc) — the unit repetition
    metrics count over. Pure array ops (``sequence``/``transform``), narrow,
    zero-shuffle. Empty array when the document has fewer than ``n`` words.

    ``words`` must be an already-PROJECTED word-array column (``F.split``
    aliased in a prior ``select``), not an inline ``split()`` expression:
    Catalyst does not CSE through the higher-order-function boundary, so an
    inline split re-evaluates once per ``element_at`` — n×positions splits
    per document (the same 7.7× cliff measured in ``dedup.shingles``)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(F.array())


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition metrics per document (NeurIPS 2021 "Scaling
    Language Models" App. A quality rules, re-expressed relationally):
    ``(id_col, n_grams, top_cnt, top_share, dup_word_frac)`` where
    ``top_share`` is the most-frequent word ``n``-gram's share of all
    ``n``-gram occurrences and ``dup_word_frac = 1 − distinct/total
    words``. High values mean boilerplate/degenerate repetition — the
    standard pre-training quality gate alongside stopword/length rules.

    Shape: explode → ``groupBy(id, gram).count()`` → ``groupBy(id)`` —
    both aggregations are partial+final hash aggs keyed by (doc, gram)
    then doc, so hot *grams* never concentrate (the key always includes
    the doc); cost is linear in total tokens with map-side combine.
    ``top_share`` is one int/int IEEE division — bit-identical across
    engines, no decimal policy needed. Documents with fewer than ``n``
    words are excluded (no grams to measure).
    """
    wdf = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__words"))
    grams = word_ngram_array(F.col("__words"), n)
    per_gram = (
        wdf.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.max("cnt").alias("top_cnt"),
    )
    words = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_words"),
        distinct_token_count(text_col).alias("n_distinct"),
    )
    return per_doc.join(words, id_col).select(
        id_col,
        "n_grams",
        "top_cnt",
        (F.col("top_cnt").cast("double") / F.col("n_grams").cast("double")).alias(
            "top_share"
        ),
        (
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
    )


def quality_rule_flags(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_words: int = 30,
    max_words: int = 80,
    min_mean_chars: int = 4,
    max_mean_chars: int = 5,
    min_distinct_stopwords: int = 2,
    max_dup_word_pct: int = 60,
) -> DataFrame:
    """Per-DOCUMENT gate flags ``(group_col, f1..f4)`` (1 = rule failed)
    — the row-level half of :func:`quality_rule_battery`, exposed so the
    streaming ledger (``streaming.rollup.continuous_quality_battery``)
    can fold raw flag rows into mergeable counts. Same integer-only
    rules; see the battery docstring."""
    t = tokens(text_col)
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    df = df.where(F.col(text_col).isNotNull())
    sig = df.select(
        F.col(group_col),
        F.size(t).alias("n"),
        F.size(F.array_distinct(t)).alias("nd"),
        F.aggregate(
            F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        ).alias("chars"),
        F.size(
            F.filter(F.array_distinct(t), lambda w: F.array_contains(stop_arr, w))
        ).alias("nstop"),
    )
    f_len = (F.col("n") < min_words) | (F.col("n") > max_words)
    f_wl = (F.col("chars") < min_mean_chars * F.col("n")) | (
        F.col("chars") > max_mean_chars * F.col("n")
    )
    f_stop = F.col("nstop") < min_distinct_stopwords
    f_rep = F.lit(100) * (F.col("n") - F.col("nd")) > F.lit(max_dup_word_pct) * F.col("n")
    return sig.select(
        group_col,
        f_len.cast("long").alias("f1"),
        f_wl.cast("long").alias("f2"),
        f_stop.cast("long").alias("f3"),
        f_rep.cast("long").alias("f4"),
    )


def quality_rule_battery(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_words: int = 30,
    max_words: int = 80,
    min_mean_chars: int = 4,
    max_mean_chars: int = 5,
    min_distinct_stopwords: int = 2,
    max_dup_word_pct: int = 60,
) -> DataFrame:
    """Gopher-style quality-rule GATE (Rae et al. 2021 App. A, the rule
    battery every pre-training corpus passes through before tokenization) —
    where q26 *scores* and q66 *measures*, this one *decides*: four
    pass/fail rules per document, reported as a per-``group_col`` failure
    breakdown so a curation run can see which source trips which rule.

    Rules (each a PURE INTEGER comparison — the ratio thresholds are
    cross-multiplied so no division, no float, ever enters a gate):

    * ``fail_length``     — word count outside [min_words, max_words];
    * ``fail_word_len``   — mean word length outside
      [min_mean_chars, max_mean_chars]: ``min·n ≤ Σchars ≤ max·n``;
    * ``fail_stopword``   — fewer than ``min_distinct_stopwords`` DISTINCT
      quality stopwords present (the classic "not natural language" tell);
    * ``fail_repetition`` — duplicate-word fraction above
      ``max_dup_word_pct``%: ``100·(n − n_distinct) > pct·n``.

    Output: ``(group_col, n_docs, fail_length, fail_word_len,
    fail_stopword, fail_repetition, n_pass, pass_rate)`` — all counts
    int64-exact, ``pass_rate`` one int/int IEEE division (the cheapest
    certification class). A document may fail several rules; ``n_pass``
    counts documents failing none.

    100 TB shape: every signal is a narrow per-row projection (array ops
    inside whole-stage codegen, no UDF); the only shuffle is the final
    #sources-row group-by with map-side combine — cost is one pass over
    the text bytes regardless of corpus size.
    """
    flags = quality_rule_flags(
        df,
        text_col,
        group_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_chars=min_mean_chars,
        max_mean_chars=max_mean_chars,
        min_distinct_stopwords=min_distinct_stopwords,
        max_dup_word_pct=max_dup_word_pct,
    )
    return flags.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f1").alias("fail_length"),
        F.sum("f2").alias("fail_word_len"),
        F.sum("f3").alias("fail_stopword"),
        F.sum("f4").alias("fail_repetition"),
        F.sum(
            ((F.col("f1") + F.col("f2") + F.col("f3") + F.col("f4")) == 0).cast("long")
        ).alias("n_pass"),
    ).select(
        group_col,
        "n_docs",
        "fail_length",
        "fail_word_len",
        "fail_stopword",
        "fail_repetition",
        "n_pass",
        (F.col("n_pass").cast("double") / F.col("n_docs").cast("double")).alias(
            "pass_rate"
        ),
    )


#: PII patterns, written to parse identically under Java regex (Spark) and
#: RE2 (DuckDB): no lookaround, no backreferences, POSIX-safe classes.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_PATTERN = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect-and-redact PII spans (emails, IPv4 addresses) — the scrubbing
    pass every production training pipeline runs before tokenization. Adds
    ``n_emails``/``n_ipv4`` match counts and a ``redacted`` column with
    spans replaced by ``<EMAIL>``/``<IP>`` placeholders.

    All JVM-side regex built-ins (``regexp_extract_all``/``regexp_replace``)
    — per-row, narrow, zero-shuffle, inside whole-stage codegen; the
    patterns avoid lookaround so the DuckDB oracle (RE2) matches the exact
    same spans. Emails are redacted before IPv4 so a numeric host part is
    never double-counted."""
    c = F.col(text_col) if isinstance(text_col, str) else F.col(text_col)
    no_email = F.regexp_replace(c, PII_EMAIL_PATTERN, "<EMAIL>")
    return df.select(
        "*",
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_PATTERN), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_IPV4_PATTERN), 0)).alias(
            "n_ipv4"
        ),
        F.regexp_replace(no_email, PII_IPV4_PATTERN, "<IP>").alias("redacted"),
    )


def deterministic_sample(
    df: DataFrame,
    text_col: str = "text",
    buckets_of_256: int = 64,
) -> DataFrame:
    """Reproducible content-hash sampling: keep rows whose md5 falls in the
    first ``buckets_of_256``/256 of hash space (rate = buckets/256).

    Never ``rand()``: the sample is a pure function of content, so task
    retries, re-runs, and other engines (the DuckDB oracle) select the
    identical rows — the property training-data pipelines need for
    reproducible mixes. Content-keyed (not id-keyed) so exact duplicates
    sample identically."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    cutoff = f"{buckets_of_256:02x}"
    return df.where(F.substring(F.md5(c), 1, 2) < F.lit(cutoff))


def vocabulary_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus-wide token frequency top-k ``(token, freq)`` — the vocabulary
    statistics a tokenizer-training / frequency-cutoff pass needs.

    Shape: explode whitespace tokens → ``groupBy(token).count()`` → top-k
    with a total order (freq desc, token asc). The aggregation is
    partial+final with map-side combine, so a hot token ("the") costs one
    combined row per map task, never a skewed reduce partition holding every
    occurrence; the top-k compiles to ``TakeOrderedAndProject`` — per
    partition k rows then a driver merge, no global sort of the vocabulary.
    At 100 TB the full pass is one shuffle of the (already combined)
    per-task partial vocabulary — the canonical word-count plan.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(k)
    )


def collocation_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """Corpus-wide bigram collocation mining: the top-``k`` adjacent word
    pairs by association lift ``count(w1 w2)·N / (count(w1)·count(w2))`` —
    the PMI argument without the log, so ranking is identical and the score
    stays ONE exact-integer division (both operands are exact int64 products
    below 2^53 converted to double; a single IEEE division is bit-identical
    across engines, no libm log involved). This is the statistic tokenizer
    merge seeding / phrase detection runs over a corpus.

    Shape: one projected-words pass (the CSE-safe pattern) exploding
    bigrams, map-side-combined counts for bigrams and unigrams, two
    bigram↔unigram joins (unigram side left to AQE — a real vocabulary is
    Zipf-heavy but unbounded, so no forced broadcast), the corpus token
    total as a broadcast scalar, and a TakeOrderedAndProject top-k.
    ``min_count`` suppresses noise pairs (standard collocation practice)
    and bounds the join fan-in. Returns ``(w1, w2, c_xy, lift)``.
    """
    wdf = df.select(F.split(F.col(text_col), " ").alias("__words"))
    w = F.col("__words")
    pairs = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 2, F.lit(0))),
        lambda i: F.struct(
            F.element_at(w, (i + 1).cast("int")).alias("w1"),
            F.element_at(w, (i + 2).cast("int")).alias("w2"),
        ),
    )
    bigrams = (
        wdf.where(F.size(w) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    uni = (
        wdf.select(F.explode(w).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = uni.agg(F.sum("c").alias("n_total"))
    return (
        bigrams.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                (F.col("c_xy") * F.col("n_total")).cast("double")
                / (F.col("c_1") * F.col("c_2")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(k, n_g)`` documents per ``group_col`` group, selected
    deterministically by content-hash order (md5(text), id tiebreak) — the
    "exactly k per stratum" curation contract (eval-set carving, per-domain
    caps), reproducible across retries, engines, and corpus growth *within
    a group's unchanged membership*.

    Shape: one hash shuffle on the group column + an in-partition window
    sort. Each group must fit a single window task — right for bounded
    strata (sources, languages, shards). For UNBOUNDED groups at 100 TB,
    exact-k requires a global per-group sort by construction; prefer the
    rate-based hash-cutoff samplers (:func:`deterministic_sample`,
    :func:`mixture_sample`), which never shuffle the corpus and bound any
    group's cost, when the contract allows a rate instead of an exact k.
    Returns ``(group_col, id_col, rn)`` with ``rn`` in 1..k.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.md5(F.col(text_col)), id_col)
    return (
        df.select(group_col, id_col, text_col)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= k)
        .select(group_col, id_col, "rn")
    )


def doc_word_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document term frequencies ``(id_col, word, tf)``.

    One explode + one (id, word)-keyed partial+final hash aggregation: the
    map-side combine collapses within-document repeats before the shuffle,
    so shuffle volume is O(distinct (doc, word)) not O(tokens). The shared
    base frame for the corpus-relative scorers below.
    """
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def rare_word_scoring(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max_count: int = 100,
) -> DataFrame:
    """Corpus-relative word-rarity quality signals per document — the
    companion to the document-local :func:`quality_score`: a doc full of
    words the corpus has barely seen is OOV-heavy/noisy (or precious),
    and either way a filtering/routing pass wants the signal.

    Emits per document: ``n_words``, ``rare_words`` (occurrences of words
    whose CORPUS count ≤ ``rare_max_count``), ``commonness_sum``
    (Σ tf·corpus_count — the exact-integer form of "how common is this
    doc's vocabulary"), plus ``rare_ratio`` and ``mean_commonness``
    (each ONE IEEE division of exact int64s, bit-identical across engines
    — no libm, no float summation order).

    Shape: :func:`doc_word_counts` once; the vocabulary is re-aggregated
    FROM it (word-keyed, input already combined — never a second corpus
    scan of raw tokens); one word-keyed join (vocabulary size is Zipf-
    bounded but unbounded in principle, so the join side is left to AQE
    rather than force-broadcast); final id-keyed aggregation. All shuffle
    keys are words or ids — no skew beyond true hot words, which the
    map-side combine already collapsed to one row per (doc, word).
    """
    dw = doc_word_counts(df, text_col, id_col)
    vocab = dw.groupBy("word").agg(F.sum("tf").cast("long").alias("c"))
    return (
        dw.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(
                F.when(F.col("c") <= rare_max_count, F.col("tf")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("rare_words"),
            F.sum(F.col("tf") * F.col("c")).cast("long").alias("commonness_sum"),
        )
        .select(
            id_col,
            "n_words",
            "rare_words",
            "commonness_sum",
            (F.col("rare_words").cast("double") / F.col("n_words").cast("double")).alias(
                "rare_ratio"
            ),
            (
                F.col("commonness_sum").cast("double") / F.col("n_words").cast("double")
            ).alias("mean_commonness"),
        )
    )


def characteristic_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document, ranked by
    ``(tf DESC, document_frequency ASC, word ASC)`` — the TF-IDF intuition
    (frequent here, rare across the corpus) as a total order in EXACT
    integer space. Deliberately NOT ``tf·log(N/df)``: the lexicographic
    rank is its own contract (primary evidence tf, rarity as tiebreak),
    reproducible bit-for-bit on any engine with no libm in the plan —
    where a float score would make the top-k frontier engine-dependent.

    Shape: :func:`doc_word_counts`, document frequency re-aggregated from
    it (word-keyed count of docs), one word-keyed join, then a per-doc
    ``row_number`` window — the window partitions by document, so no
    single task ever sees more than one document's vocabulary.
    Returns ``(id_col, word, tf, df, rn)``.
    """
    from pyspark.sql import Window

    dw = doc_word_counts(df, text_col, id_col)
    dfreq = dw.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), "word"
    )
    return (
        dw.join(dfreq, "word")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= k)
        .select(id_col, "word", "tf", "df", "rn")
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Pairwise content overlap between corpus slices (sources/domains):
    distinct word-``n``-gram shingle sets per slice, intersected across
    every slice pair — the cross-source contamination matrix a mixture
    designer checks before weighting domains (is "webcrawl B" just
    "webcrawl A" again?).

    Emits ``(source_1, source_2, n_1, n_2, n_common, jaccard)`` for pairs
    with ≥1 shared shingle; ``jaccard`` is ONE IEEE division of exact
    int64 counts.

    Shape — ONE corpus scan, one linear chain (a naive self-join + size
    joins evaluates the corpus-sized shingle subtree once per branch —
    measured 4-6 scans in the pre-AQE plan; attribute aliasing defeats
    ReuseExchange): shingle explode (narrow, per-row distinct) → one
    (slice, shingle) distinct shuffle → one shingle-keyed aggregation to
    the per-shingle sorted slice set (bounded by slice CARDINALITY, which
    is small by construction — sources, not documents) → a single narrow
    generate emits marker rows ``(s, NULL)``/``(NULL, s)`` and pair rows
    ``(s_i, s_j)`` per shingle → one tiny aggregation counts per-slice
    sizes and pair intersections TOGETHER → two windows over the
    O(slices²) counted frame attach each pair's sizes (no joins, nothing
    corpus-sized past the shingle agg).
    """
    from pyspark.sql import Window

    from reactive_kinesis_spark.operators.dedup import shingles

    sl = shingles(df, text_col, group_col, n).distinct()
    by_sh = sl.groupBy("shingle").agg(
        F.sort_array(F.collect_set(group_col)).alias("gs")
    )
    gs = F.col("gs")
    null_s = F.lit(None).cast("string")
    units1 = F.transform(gs, lambda s: F.struct(s.alias("source_1"), null_s.alias("source_2")))
    units2 = F.transform(gs, lambda s: F.struct(null_s.alias("source_1"), s.alias("source_2")))
    pairs = F.flatten(
        F.transform(
            gs,
            lambda s, i: F.transform(
                F.slice(gs, i + F.lit(2), F.size(gs)),
                lambda t: F.struct(s.alias("source_1"), t.alias("source_2")),
            ),
        )
    )
    counted = (
        by_sh.select(F.explode(F.concat(units1, units2, pairs)).alias("e"))
        .select("e.source_1", "e.source_2")
        .groupBy("source_1", "source_2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w1 = Window.partitionBy("source_1")
    w2 = Window.partitionBy("source_2")
    return (
        counted.withColumn(
            "n_1", F.max(F.when(F.col("source_2").isNull(), F.col("cnt"))).over(w1)
        )
        .withColumn(
            "n_2", F.max(F.when(F.col("source_1").isNull(), F.col("cnt"))).over(w2)
        )
        .where(F.col("source_1").isNotNull() & F.col("source_2").isNotNull())
        .select(
            "source_1",
            "source_2",
            "n_1",
            "n_2",
            F.col("cnt").alias("n_common"),
            (
                F.col("cnt").cast("double")
                / (F.col("n_1") + F.col("n_2") - F.col("cnt")).cast("double")
            ).alias("jaccard"),
        )
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Temperature-balanced mixture weights at alpha = 0.5: each group's
    target sampling share is proportional to ``sqrt(n_g)`` — the standard
    temperature rebalancing for multi-source/multilingual corpora
    (upweights small sources relative to their natural share so no giant
    crawl dominates, without flattening to uniform). The output feeds
    straight into :func:`mixture_sample` as its ``weights``.

    Emits per group: ``n_docs``, ``natural_share`` (n_g / N),
    ``target_share`` (sqrt(n_g) / Σ sqrt(n_g)) and ``oversample_factor``
    (target / natural — >1 means the source would be up-weighted).

    Numerics are engine-exact: counts are integers; ``sqrt`` is IEEE
    correctly-rounded (bit-identical everywhere); each per-group sqrt is
    snapped to DECIMAL(38,6) so the cross-group denominator is an EXACT,
    order-free decimal sum (float summation order is the one thing two
    engines — or two partitionings of the same engine — never agree on);
    the shares are then single IEEE divisions in a fixed operand order
    (mirrored in the q79 oracle).

    Plan shape at 100 TB: one map-side-combined count aggregate collapses
    the corpus to #groups rows; everything downstream runs on that tiny
    frame (the 1-row denominator is broadcast). The corpus is scanned once
    and never shuffled.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    sq = F.sqrt(F.col("n_docs").cast("double")).cast("decimal(38,6)")
    totals = counts.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum(sq).cast("double").alias("denom"),
    )
    sqd = sq.cast("double")
    natural = F.col("n_docs").cast("double") / F.col("total_docs").cast("double")
    target = sqd / F.col("denom")
    return counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        natural.alias("natural_share"),
        target.alias("target_share"),
        (target / natural).alias("oversample_factor"),
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab_size: int = 15,
) -> DataFrame:
    """Out-of-vocabulary rate per group against a corpus-derived top-K
    vocabulary — the coverage-drift detector a tokenizer-bound pipeline
    runs per source/snapshot: a source whose tokens increasingly fall
    outside the reference vocabulary is drifting away from what the
    tokenizer was fit on (new language, new domain, encoding rot).

    Vocabulary = the ``vocab_size`` globally most frequent tokens, ties
    broken by token text — fully deterministic, derived inside the same
    plan (no driver collect). Per group: total token occurrences, OOV
    occurrences, and ``oov_rate`` (one int/int IEEE division).

    100 TB shape: one explode + two map-side-combined aggregates; the
    vocabulary is ``LIMIT vocab_size`` of the global count (distributed
    TakeOrdered, bounded by construction) and re-enters the plan as a
    BROADCAST left-anti membership probe — the corpus token stream
    never joins anything bigger than K rows.
    """
    tok = df.where(F.col(text_col).isNotNull()).select(
        F.col(group_col), F.explode(tokens(text_col)).alias("token")
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), "token")
        .limit(vocab_size)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            group_col,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_rate"
            ),
        )
    )


def token_budget_allocation(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    budget_tokens: int = 110_000,
    max_epochs: int = 4,
) -> DataFrame:
    """Token-budget allocation across sources — the step AFTER
    :func:`temperature_weights`: given a global training-token budget,
    turn the temperature target shares (alpha = 0.5 over per-source
    TOKEN counts, not doc counts) into an executable plan — how many
    tokens each source contributes, how many epochs (repeats) of it that
    implies, and how much of its ask is forfeited when the repeat cap
    bites (the "no source repeats more than E times" rule every
    pre-training mix applies to avoid memorizing small sources).

    Per group: ``avail_tokens`` (int64 whitespace-token sum),
    ``target_share`` (sqrt-temperature share, decimal-snapped exact
    denominator — the q79 numeric contract), ``alloc_tokens =
    floor(budget · share)``, ``epochs = alloc / avail`` (one IEEE
    division), ``granted_tokens = min(alloc, max_epochs · avail)`` and
    ``shortfall_tokens = alloc − granted`` (pure ints).

    100 TB shape: identical to :func:`temperature_weights` — the corpus
    collapses to #sources rows in one map-side-combined aggregate and is
    never shuffled; everything else runs on the tiny plan frame.
    """
    counts = df.where(F.col(text_col).isNotNull()).groupBy(group_col).agg(
        F.sum(F.size(tokens(text_col)).cast("long")).alias("avail_tokens")
    )
    sq = F.sqrt(F.col("avail_tokens").cast("double")).cast("decimal(38,6)")
    totals = counts.agg(F.sum(sq).cast("double").alias("__denom"))
    share = sq.cast("double") / F.col("__denom")
    alloc = F.floor(F.lit(float(budget_tokens)) * share).cast("long")
    capped = F.least(F.col("alloc_tokens"), F.lit(max_epochs) * F.col("avail_tokens"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            "avail_tokens",
            share.alias("target_share"),
            alloc.alias("alloc_tokens"),
        )
        .select(
            group_col,
            "avail_tokens",
            "target_share",
            "alloc_tokens",
            (
                F.col("alloc_tokens").cast("double")
                / F.col("avail_tokens").cast("double")
            ).alias("epochs"),
            capped.alias("granted_tokens"),
            (F.col("alloc_tokens") - capped).alias("shortfall_tokens"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    min_share_permille: int = 2,
) -> DataFrame:
    """Exact corpus heavy hitters — every word holding at least
    ``min_share_permille``/1000 of all token occurrences — found WITHOUT a
    full-vocabulary aggregation.

    Two passes, neither vocabulary-sized:

    1. **Candidates** via Spark's one-pass misra-gries style
       ``stat.freqItems`` at a support just under the threshold. Its
       contract guarantees every item above support is returned (plus
       false positives), so the candidate set is a SUPERSET of the answer
       and is bounded by ~1/support items regardless of corpus size.
    2. **Exact verification**: one corpus re-scan counting ONLY candidate
       words (broadcast ``isin`` filter — the aggregate state is candidate-
       sized, never vocabulary-sized), kept where
       ``1000 * cnt >= min_share_permille * total`` — exact integer
       arithmetic, so the result is deterministic and engine-portable even
       though step 1 is approximate.

    This is the 100 TB shape for "which tokens dominate the corpus": the
    full groupBy-word alternative shuffles the whole vocabulary (fine at
    q71's top-k scale, wasteful when only hitters ≥ 0.2% are wanted).
    ``share`` is one IEEE division of exact int64s.
    """
    words = df.select(F.explode(tokens(text_col)).alias("word"))
    support = max(min_share_permille / 1000.0 * 0.5, 1e-4)
    cand = [
        w
        for w in words.stat.freqItems(["word"], support).collect()[0][0]
        if w is not None
    ]
    total_row = words.agg(F.count(F.lit(1)).alias("t")).collect()[0]
    total = int(total_row.t)
    if not cand:
        return (
            words.limit(0)
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .withColumn("share", F.col("cnt").cast("double"))
        )
    return (
        words.where(F.col("word").isin(cand))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.lit(1000) * F.col("cnt") >= F.lit(min_share_permille) * F.lit(total))
        .select(
            "word",
            "cnt",
            (F.col("cnt").cast("double") / F.lit(total).cast("double")).alias(
                "share"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    training-example preparation step between curation and tokenization
    (``stride < chunk_tokens`` keeps context across boundaries; the last
    window per doc may be short, and a doc shorter than one window yields
    exactly one chunk).

    Emits ``(id_col, chunk_id, chunk_text, n_chunk_tokens)`` with
    ``chunk_id`` the 0-based window index at starts 0, stride, 2·stride...
    strictly below the document's token count. A window whose PREDECESSOR
    already reached the last token is not emitted (it would be fully
    contained in the previous chunk — pure token-budget waste), so the
    final chunk is the first one that touches the document's end.

    Pure array ops: ONE projected ``split`` per document (never inline in
    the lambda — the round-4 CSE-through-HOF cliff), ``sequence`` for the
    window starts, ``slice``+``concat_ws`` per window, one ``posexplode``.
    Narrow and zero-shuffle: output rows ≈ tokens/stride per doc, produced
    in the same task that read the doc — at 100 TB this pipelines straight
    into the tokenizer with no exchange anywhere.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"need 0 < stride ({stride}) <= chunk_tokens ({chunk_tokens})")
    words = F.col("__words")
    n = F.size(words)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        # drop windows fully contained in their predecessor: emit s only if
        # the previous window (s - stride, +chunk_tokens) stopped short
        lambda s: (s == 0) | (s - stride + chunk_tokens < n),
    )
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(words, s + 1, chunk_tokens))
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__words"))
        .select(id_col, F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            id_col,
            "chunk_id",
            "chunk_text",
            F.size(F.split("chunk_text", " ")).cast("int").alias("n_chunk_tokens"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — exactly ``min(k, n_g)`` rows
    per ``group_col`` group with inclusion propensity proportional to
    ``weight_col`` (Efraimidis & Spirakis 2006, the A-ES reservoir keys):
    rank by ``ln(u) / w`` descending, where ``u`` is a uniform draw in
    (0, 1). The size-biased companion to :func:`stratified_sample` — "carve
    an eval set but prefer substantial documents", "sample transcripts
    proportional to duration".

    ``u`` is NOT ``rand()``: it is derived from the row's id hash
    (``(int(md5(id)[:8], 16) + 0.5) / 2^32`` — the +0.5 keeps u strictly
    inside (0,1) so ``ln`` is finite), making selection a pure function of
    content like every sampler in this module: task retries, re-runs, and
    other engines draw the identical sample. ``ln`` here is the one libm
    call in this module; it only ORDERS candidates (the emitted columns are
    the exact inputs), and two independent 2^-32-grid draws landing within
    one ulp of each other after ``/w`` is the only way engines could
    disagree — vanishing, and absent entirely in the driver compare since
    both engines hash identical md5 draws.

    Shape: identical to :func:`stratified_sample` — one hash shuffle on the
    group column + an in-partition window sort; same bounded-strata
    contract (for unbounded groups, fall back to rate-based samplers).
    Returns ``(group_col, id_col, weight, rn)``.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    # A-ES requires strictly positive weights: a row with NULL/0/negative
    # weight has zero inclusion probability by contract and is excluded
    # (ln(u)/0 would otherwise divide by zero under ANSI mode)
    df = df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.col("__aes_key").desc(), id_col)
    return (
        df.select(
            group_col,
            id_col,
            F.col(weight_col).alias("weight"),
            key.alias("__aes_key"),
        )
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= k)
        .select(group_col, id_col, "weight", "rn")
    )


def surprisal_scoring(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under the corpus's OWN unigram model,
    quantized to exact integer bits — the engine-portable form of the
    perplexity quality filter (CCNet-style: route/downweight documents the
    corpus LM finds surprising). A word with corpus count ``c`` out of
    ``T`` total tokens carries ``floor(log2 T) - floor(log2 c)`` bits of
    (quantized) surprisal; a document's score is the tf-weighted sum.

    The quantization is the portability contract: ``floor(log2 x)`` is
    computed as ``length(bin(x)) - 1`` — pure integer/string ops, no libm
    anywhere, so scores are bit-identical across engines and hardware
    (a float ``Σ tf·ln(T/c)`` would depend on both libm and summation
    order). On a deployment that wants nats, swapping the quantized term
    for ``ln`` is a one-line change that alters no plan shape.

    Shape: :func:`doc_word_counts` once; vocabulary re-aggregated from it;
    the corpus total re-aggregated from the VOCABULARY (word-count-sized,
    not corpus-sized) and attached as a broadcast single-row frame; one
    word-keyed join; final id-keyed aggregation — the same two-shuffle
    skeleton as :func:`rare_word_scoring`, which measures the linear-domain
    signal where this measures the log-domain one. ``bits_per_token`` is
    one IEEE division of exact int64s. Returns
    ``(id_col, n_words, surprisal_bits, bits_per_token)``.
    """
    dw = doc_word_counts(df, text_col, id_col)
    vocab = dw.groupBy("word").agg(F.sum("tf").cast("long").alias("c"))
    total = vocab.agg(F.sum("c").cast("long").alias("t"))
    log2 = lambda c: (F.length(F.bin(c)) - 1).cast("long")  # noqa: E731
    return (
        dw.join(vocab, "word")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(F.col("tf") * (log2(F.col("t")) - log2(F.col("c"))))
            .cast("long")
            .alias("surprisal_bits"),
        )
        .select(
            id_col,
            "n_words",
            "surprisal_bits",
            (
                F.col("surprisal_bits").cast("double")
                / F.col("n_words").cast("double")
            ).alias("bits_per_token"),
        )
    )


def feature_hash(
    df: DataFrame,
    dims: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature hashing (the "hashing trick"): project each document's bag
    of words into a FIXED ``dims``-dimensional sparse vector, emitted in
    long form ``(id_col, dim, weight)`` with ``weight`` = summed tf of the
    words hashing to that dimension. The vectorizer for linear
    quality/topic classifiers at corpus scale — no vocabulary dictionary
    to build, broadcast, or keep consistent across ingests, which is the
    entire point at 100 TB: the feature space is a pure function of
    content, so yesterday's model scores today's shard unchanged.

    The hash is the engine-portable md5-prefix (same draw as
    :func:`weighted_sample`), not ``xxhash64`` — so vectors are identical
    across engines/retries. Shape: :func:`doc_word_counts` once, then one
    (id, dim)-keyed partial+final aggregation — map-side combine collapses
    the hot dimensions before the shuffle; nothing vocabulary-sized is
    ever materialized.
    """
    if dims < 1:
        raise ValueError(f"need dims >= 1, got {dims}")
    dw = doc_word_counts(df, text_col, id_col)
    dim = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % dims
    ).cast("int")
    return (
        dw.groupBy(F.col(id_col), dim.alias("dim"))
        .agg(F.sum("tf").cast("long").alias("weight"))
    )


def blocklist_stats(
    df: DataFrame,
    blocklist: tuple[str, ...],
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Safety/blocklist gating report: per ``group_col`` group, how many
    documents contain at least one blocklisted TERM (exact whole-token
    match against the tokenized text — not substring, so "class" never
    trips a "ass" entry) and the resulting block rate — the monitoring
    face of the curation filter (compose ``where(NOT hit)`` with the same
    predicate to actually drop).

    Pure narrow ops: one projected split per doc, one ``arrays_overlap``
    against the broadcast-literal blocklist (term lists are KB-sized;
    they ride the plan as a literal array, no join), then a group-keyed
    partial+final count. ``block_rate`` is one IEEE division of exact
    int64s. Returns ``(group_col, n_docs, n_blocked, block_rate)``.
    """
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    hit = F.arrays_overlap(
        tokens(text_col), F.array(*[F.lit(w) for w in blocklist])
    )
    return (
        df.select(group_col, hit.alias("__hit"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("__hit"), 1).otherwise(0)).cast("long").alias("n_blocked"),
        )
        .select(
            group_col,
            "n_docs",
            "n_blocked",
            (F.col("n_blocked").cast("double") / F.col("n_docs").cast("double")).alias(
                "block_rate"
            ),
        )
    )


def bm25_scoring(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantized BM25 relevance of every document against a fixed query —
    the retrieval scorer a RAG-curation pass runs over the corpus (k1=1.2,
    b=0.75, the Robertson defaults). Like :func:`surprisal_scoring`, the
    score is quantized to EXACT integer arithmetic so it is bit-identical
    across engines, hardware, and summation order — no libm, no float
    accumulation:

    * idf is floor-log2 bits: ``(length(bin(N)) - 1) - (length(bin(df)) - 1)``
      — the integer skeleton of ``log(N/df)``;
    * the tf-saturation factor ``tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
      is evaluated in scaled integers: avgdl quantized to millitokens
      (``1000·T div N``), the denominator to milliunits, the factor to
      micro-units — three integer floor-divisions, each deterministic.

    ``score_micro`` = Σ over matched query terms of
    ``idf_bits · sat_micro`` (int64). Overflow-safe while
    ``2.2e9 · max_tf < 2^63`` and ``1000·T < 2^63`` — i.e. corpus token
    counts up to ~9e15 (petascale); past that, widen the three scaled
    products to DECIMAL(38,0) (plan shape unchanged).

    Shape: :func:`doc_word_counts` once; doc lengths re-aggregated from it
    (id-keyed, already combined); per-term document frequencies only for
    the query terms (a handful of rows — broadcast); corpus totals
    re-aggregated from the doc-length frame (doc-count-sized) and attached
    as a broadcast single-row frame. The corpus-sized frames are keyed by
    id or word throughout; nothing vocabulary- or corpus-sized is ever
    collected. Returns ``(id_col, n_terms, score_micro)`` for documents
    matching ≥1 query term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    dw = doc_word_counts(df, text_col, id_col)
    dl = dw.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("t"),
    )
    terms = F.array(*[F.lit(w) for w in query_terms])
    dfreq = (
        dw.where(F.array_contains(terms, F.col("word")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    )
    log2 = lambda c: (F.length(F.bin(c)) - 1).cast("long")  # noqa: E731
    matched = (
        dw.join(F.broadcast(dfreq), "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(totals))
    )
    adl_milli = F.expr("1000 * t div n")
    scored = matched.select(
        F.col(id_col),
        (log2(F.col("n")) - log2(F.col("df_t"))).alias("__idf_bits"),
        F.col("tf"),
        F.col("dl"),
        adl_milli.alias("__adl_milli"),
    ).select(
        F.col(id_col),
        "__idf_bits",
        F.expr(
            "2200000000 * tf div (1000 * tf + 300 + (900000 * dl div __adl_milli))"
        ).alias("__sat_micro"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.col("__idf_bits") * F.col("__sat_micro"))
            .cast("long")
            .alias("score_micro"),
        )
    )


def tf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 50,
    threshold: float = 0.5,
    word_counts: DataFrame | None = None,
    max_df_denom: int | None = None,
) -> DataFrame:
    """Document-pair cosine similarity over exact term-frequency vectors,
    with inverted-index blocking — the sparse-vector twin of q42's dense
    embedding near-dup: candidate pairs are docs sharing ≥1 DISCRIMINATIVE
    term (corpus document frequency ≤ ``max_df``; ubiquitous terms carry
    no pairing signal and would otherwise make the index quadratic — the
    same df-cap discipline as the n-gram Jaccard join), scored by cosine
    over their FULL tf vectors, kept at ``cosine ≥ threshold``.

    Bit-exact across engines: the dot product and squared norms are int64
    sums; ``sqrt`` and one division/multiplication are IEEE
    correctly-rounded, so no float summation order exists anywhere.

    Shape: :func:`doc_word_counts` once → (a) per-doc squared norms
    (id-keyed agg), (b) the df-capped inverted index (word-keyed self-join
    emitting candidate id pairs, ordered id1 < id2, deduped), (c) the dot
    product = word-keyed self-join of tf rows semi-joined to candidates,
    aggregated per pair. Exchanges are word- or pair-keyed only; the
    candidate count is bounded by Σ_w df_w² over rare words, never N².
    Returns ``(id_1, id_2, cosine_tf)``.

    The declarative plan re-derives ``doc_word_counts`` per branch (each
    feeding a different-keyed aggregate) — harmless at test scale, but at
    100 TB that's several corpus scans. Pass ``word_counts`` = a
    materialized ``doc_word_counts(df)`` (ideally ``write_bucketed`` by
    word, the q22/q23 recipe) and every branch reads the compact
    (id, word, tf) frame instead; results are identical.

    ``max_df_denom`` makes the cap CORPUS-RELATIVE and IN-PLAN:
    ``max(1, N div max_df_denom)`` where N = the corpus row count,
    computed as a broadcast single-row frame inside the same plan (the
    pagerank ``n_total`` pattern) — no driver-side ``.count()``, so no
    separate full pass over the corpus before the query proper. When
    set, ``max_df`` is ignored.
    """
    base = (
        word_counts
        if word_counts is not None
        else doc_word_counts(df, text_col, id_col)
    )
    dw = base.select(F.col(id_col).alias("__id"), "word", "tf")
    norms = dw.groupBy("__id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("__sq")
    )
    dfreq = dw.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    if max_df_denom is not None:
        cap = df.agg(
            F.expr(
                f"greatest(CAST(1 AS BIGINT), count(1) DIV {int(max_df_denom)})"
            ).alias("__cap")
        )
        rare = (
            dfreq.crossJoin(F.broadcast(cap))
            .where(F.col("__df") <= F.col("__cap"))
            .select("word")
        )
    else:
        rare = dfreq.where(F.col("__df") <= max_df).select("word")
    idx = dw.join(rare, "word").select("word", F.col("__id"))
    cands = (
        idx.alias("a")
        .join(idx.alias("b"), "word")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_1"), F.col("b.__id").alias("id_2"))
        .distinct()
    )
    # dot products CANDIDATE-FIRST: expand each candidate pair by doc1's tf
    # rows, then equi-join doc2's matching words on (id_2, word). Joining
    # dw⋈dw on word and filtering to candidates afterwards would build
    # Σ_w df_w² rows over ALL words (ubiquitous ones included) — the exact
    # quadratic blowup the df cap exists to avoid (measured: 148 s → 8 s
    # at sf0.1 on the degenerate-vocabulary synthetic corpus).
    dwx = dw.select(F.col("__id").alias("id_1"), "word", F.col("tf").alias("__tf1"))
    dwy = dw.select(F.col("__id").alias("id_2"), "word", F.col("tf").alias("__tf2"))
    dots = (
        cands.join(dwx, "id_1")
        .join(dwy, ["id_2", "word"])
        .groupBy("id_1", "id_2")
        .agg(F.sum(F.col("__tf1") * F.col("__tf2")).cast("long").alias("__dot"))
    )
    return (
        dots.join(norms.select(F.col("__id").alias("id_1"), F.col("__sq").alias("__sq1")), "id_1")
        .join(norms.select(F.col("__id").alias("id_2"), F.col("__sq").alias("__sq2")), "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("__dot").cast("double")
                / (
                    F.sqrt(F.col("__sq1").cast("double"))
                    * F.sqrt(F.col("__sq2").cast("double"))
                )
            ).alias("cosine_tf"),
        )
        .where(F.col("cosine_tf") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_col: Column | str,
    max_distance: int = 3,
) -> DataFrame:
    """Fuzzy string-similarity join: pairs of rows whose ``name_col``
    values are within ``max_distance`` Levenshtein edits, found via
    blocking — the entity-resolution primitive (typo'd product names,
    near-identical titles) that must never run as an N² cross join.

    ``block_col`` is the blocking key (e.g. a token, a phonetic code, a
    length band — compose several for tighter blocks): only pairs sharing
    a block are compared, so cost is Σ_b |block_b|², bounded by the
    blocking discipline, not corpus size. The Levenshtein evaluation uses
    Spark's bounded form (``levenshtein(l, r, threshold)``) so each
    comparison early-exits at ``max_distance+1`` — O(d·min(len)) per pair
    instead of O(len²). Distances are exact integers; no float anywhere.

    Returns ``(id_1, id_2, name_1, name_2, distance)`` with id_1 < id_2.
    """
    b = F.col(block_col) if isinstance(block_col, str) else block_col
    side = df.select(
        F.col(id_col).alias("__id"), F.col(name_col).alias("__name"), b.alias("__blk")
    )
    return (
        side.alias("a")
        .join(side.alias("b"), "__blk")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_1"),
            F.col("b.__id").alias("id_2"),
            F.col("a.__name").alias("name_1"),
            F.col("b.__name").alias("name_2"),
            F.levenshtein(F.col("a.__name"), F.col("b.__name"), max_distance).alias(
                "distance"
            ),
        )
        .where((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.98,
    val: float = 0.01,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment — the split
    every training pipeline needs to be STABLE across reruns, machines,
    and engines: membership depends only on the row's id (56 md5 bits →
    bucket in [0, buckets)), never on partitioning, sampling order, or a
    seed table. Adding documents never moves existing ones between
    splits (the holdout-contamination guarantee).

    Appends ``split`` ∈ {'train','val','test'}: buckets
    ``[0, train·buckets)`` → train, ``[…, (train+val)·buckets)`` → val,
    rest → test. NULL ids fall through to 'test' (the conservative side:
    never into training data); enforce non-null ids upstream with
    quality.check_constraints if that matters. Narrow projection — zero
    shuffle, zero UDF.
    """
    if not 0 < train + val < 1:
        raise ValueError("train + val must be in (0, 1)")
    b = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 14), 16, 10)
        .cast("long")
        % buckets
    )
    t_hi = int(train * buckets)
    v_hi = int((train + val) * buckets)
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_col: str,
    id_col: str,
    block_expr: Column,
    window: int = 2,
    max_distance: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation for entity resolution —
    the OTHER classic blocking scheme next to
    :func:`edit_distance_pairs`' equality blocks: sort records within a
    block and compare each record only to its next ``window`` neighbors
    in sort order. Robust where equality blocking is brittle (typos in
    the block key move a record a few positions, not into a different
    block), at the price of missing pairs that sort far apart —
    production ER runs BOTH and unions the candidates (multi-pass SN).

    Scale shape: ONE block-keyed exchange; the sort is per-block (window
    ``partitionBy(block) orderBy(sort, id)``), never global — the
    textbook single-sort formulation would funnel the corpus through one
    partition. Each record emits ≤ ``window`` pairs, so the candidate
    set is O(n·window) by construction. Pairs that straddle block
    boundaries are missed — the documented multi-pass tradeoff.

    Output: ``(id_1, id_2, name_1, name_2, distance)`` (distance =
    Levenshtein; rows filtered to ``<= max_distance`` when given, using
    Spark's bounded early-exit form).
    """
    from pyspark.sql import Window

    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.partitionBy("__blk").orderBy(sort_col, id_col)
    s = df.select(
        F.col(id_col), F.col(sort_col), block_expr.alias("__blk")
    )
    neighbors = F.array(
        *[
            F.struct(
                F.lead(id_col, k).over(w).alias("id"),
                F.lead(sort_col, k).over(w).alias("name"),
            )
            for k in range(1, window + 1)
        ]
    )
    with_nbrs = s.select(
        F.col(id_col).alias("id_1"),
        F.col(sort_col).alias("name_1"),
        neighbors.alias("__ns"),
    )
    pairs = (
        with_nbrs.select("id_1", "name_1", F.explode("__ns").alias("__n"))
        .where(F.col("__n.id").isNotNull())
        .select(
            "id_1",
            F.col("__n.id").alias("id_2"),
            "name_1",
            F.col("__n.name").alias("name_2"),
        )
    )
    if max_distance is not None:
        dist = F.levenshtein("name_1", "name_2", max_distance)
        pairs = (
            pairs.withColumn("distance", dist.cast("long"))
            .where(F.col("distance") >= 0)
            .where(F.col("distance") <= max_distance)
        )
    else:
        pairs = pairs.withColumn(
            "distance", F.levenshtein("name_1", "name_2").cast("long")
        )
    return pairs


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_registry: list | None = None,
) -> DataFrame:
    """Per-document fluency under the corpus's OWN Laplace-smoothed
    bigram LM — the word-ORDER-sensitive complement of
    :func:`surprisal_scoring` (whose unigram model scores "the the the"
    as perfectly ordinary; a bigram model does not). This is the
    cheap-LM quality gate of a curation pipeline: documents whose
    adjacent-word transitions the corpus has never seen (boilerplate
    mashups, shuffled scrapes, wrong-language fragments) score low.

    Each bigram's probability is ``p = (c12 + 1) / (c1 + V)`` — a single
    IEEE division of exact int64 counts (c12 = corpus count of the
    bigram, c1 = corpus count of the context word as a bigram start, V =
    corpus vocabulary size; Laplace smoothing keeps unseen transitions
    finite). For portability the per-bigram score is quantized to
    ``floor(p · 2^40)``: multiplying by a power of two is EXACT and
    floor is exact, so the quantized scores — and their per-document
    integer sums and mins — are bit-identical in any engine (the
    q151/q158 baked-scale discipline; geometric means / log-space
    perplexity would need libm and are deliberately avoided).

    Returns per document (≥ 2 words):
    ``(id_col, n_bigrams, sum_p_q40, min_p_q40, avg_p_q40)`` where
    ``avg_p_q40 = sum_p_q40 / n_bigrams`` is one division of exact ints
    (scores are on the 2^40 scale; divide by 2^40 for probabilities —
    the scale cancels in any ranking or thresholding).

    100 TB shape: bigram counts are one map-side-combined aggregate
    keyed by the bigram; doc bigrams rejoin that table on the same key
    (one exchange, reused partitioning); context counts join on the
    start word; V rides along as a broadcast single-row frame; the final
    aggregate is id-keyed. No collects, no UDFs — every step is a JVM
    built-in over exploded word pairs.
    """
    # ONE corpus tokenization feeds all four consumers (bigram counts,
    # context counts, the scoring join, and the vocabulary) — persisted so
    # the text column (possibly computed: q196's synthetic corpus is an
    # inline md5 chain) materializes once instead of four times
    # (``cache_registry=[]`` receives the frame for deterministic unpersist)
    from reactive_kinesis_spark.operators.dedup import _persist

    toks = _persist(
        df.where(F.col(text_col).isNotNull()).select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("__ws")
        ),
        cache_registry,
    )
    words = toks.where(F.size("__ws") >= 2)
    bg = words.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("__ws", 1, F.size("__ws") - 1).alias("w1"),
                F.slice("__ws", 2, F.size("__ws") - 1).alias("w2"),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = (
        toks.select(F.explode("__ws").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    p = (F.col("c12") + F.lit(1)).cast("double") / (
        F.col("c1") + F.col("v")
    ).cast("double")
    s = F.floor(p * F.lit(float(1 << 40))).cast("long")
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, s.alias("__s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__s").cast("long").alias("sum_p_q40"),
        F.min("__s").cast("long").alias("min_p_q40"),
    ).select(
        id_col,
        "n_bigrams",
        "sum_p_q40",
        "min_p_q40",
        (
            F.col("sum_p_q40").cast("double") / F.col("n_bigrams").cast("double")
        ).alias("avg_p_q40"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility report per group (typically language):
    BPE-ish tokens per whitespace word and bytes per token — the
    standard check that a tokenizer doesn't tax some languages with
    3-4× the tokens per word of others (fertility drives both training
    cost and context-window economics, so a multilingual pipeline
    tracks it per corpus slice before committing a token budget).

    Every metric is an integer sum (token counts via the shared
    :func:`bpe_token_count` regex, word counts via whitespace split,
    bytes via ``octet_length``) followed by a single IEEE division —
    the integer-division certification family.

    Returns ``(group_col, n_docs, n_words, n_tokens, n_bytes,
    tokens_per_word, bytes_per_token)``.

    100 TB shape: one scan, three narrow per-row expressions, one
    map-side-combined aggregate on the group key. Nothing else.
    """
    return (
        df.select(
            F.col(group_col),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("__w"),
            bpe_token_count(text_col).cast("long").alias("__t"),
            F.octet_length(text_col).cast("long").alias("__b"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__w").cast("long").alias("n_words"),
            F.sum("__t").cast("long").alias("n_tokens"),
            F.sum("__b").cast("long").alias("n_bytes"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_tokens",
            "n_bytes",
            (F.col("n_tokens").cast("double") / F.col("n_words").cast("double")).alias(
                "tokens_per_word"
            ),
            (F.col("n_bytes").cast("double") / F.col("n_tokens").cast("double")).alias(
                "bytes_per_token"
            ),
        )
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 6,
    word_end: str = "</w>",
) -> DataFrame:
    """Learn the first ``k`` byte-pair-encoding merges from a corpus —
    the distributed core of tokenizer TRAINING (Sennrich et al. 2016),
    complementing the inference-side operators (``bpe_token_count``,
    tokenizer fertility, OOV drift) with the step that produces the vocab
    they consume.

    Pipeline: ONE corpus scan builds the word-frequency table (the only
    corpus-sized stage); every merge iteration then runs on that
    vocab-sized frame — words are kept as ``|``-joined symbol strings
    (chars + a terminal ``word_end`` marker), pair counts come from one
    explode + map-side-combined sum per iteration, the argmax pair
    (count DESC, pair ASC — a total order) re-enters as a BROADCAST
    single-row frame (never a collect), and the merge itself is a
    sequential string fold: scanning symbols left-to-right, the
    accumulator appends ``right`` WITHOUT a separator whenever its last
    symbol equals ``left`` (checked with an exact ``|``-boundary suffix
    test) — byte-for-byte the greedy leftmost-non-overlapping merge of
    reference BPE implementations, and exactly mirrorable as a DuckDB
    ``list_reduce``. Everything is string/int arithmetic: no float
    enters the pipeline, so the result is hash-certifiable with no
    quantization tricks.

    Returns ``(merge_rank, left_sym, right_sym, merged, pair_count)`` —
    ``k`` rows, the merge table in priority order.

    100 TB shape: the corpus contributes one scan + one word-keyed
    map-side-combined count; iterations touch only the vocab frame
    (natural-language vocab is millions of rows, not corpus-sized),
    localCheckpointed per round so plan size stays O(1) in ``k``. The
    argmax is a TakeOrdered(1), not a global sort. Precondition: words
    must not contain ``|`` (the symbol separator) — filter or remap
    upstream for corpora where that can occur.
    """
    if k < 1:
        raise ValueError("k >= 1 required")
    v = _bpe_initial_vocab(docs, text_col, word_end).localCheckpoint(eager=False)

    merges = []
    for i in range(1, k + 1):
        syms = v.select(F.split("w", r"\|").alias("syms"), "freq")
        best = _bpe_best_pair(syms).localCheckpoint(eager=False)
        merges.append(
            best.select(
                F.lit(i).alias("merge_rank"),
                F.col("__l").alias("left_sym"),
                F.col("__r").alias("right_sym"),
                F.concat("__l", "__r").alias("merged"),
                "pair_count",
            )
        )
        v = _bpe_apply_merge(syms, best).localCheckpoint(eager=False)

    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _bpe_best_pair(syms: DataFrame) -> DataFrame:
    """One BPE iteration's argmax: adjacent-pair counts from the symbol
    arrays (one explode + one map-side-combined sum — the only wide op of
    the iteration) reduced to a single row by the (count DESC, pair ASC)
    total order. TakeOrdered(1), never a global sort."""
    pairs = syms.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms)-1),"
                " j -> concat(element_at(syms, j), ' ',"
                " element_at(syms, j+1)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(1)
        .select(
            F.split("pair", " ").getItem(0).alias("__l"),
            F.split("pair", " ").getItem(1).alias("__r"),
            "pair_count",
        )
    )


def _bpe_apply_merge(
    syms: DataFrame, best: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Apply the selected merge to every vocab word: the single-row best
    frame enters as a BROADCAST crossJoin (never a collect), and the
    merge is the sequential string fold — appending ``right`` WITHOUT a
    separator whenever the accumulator's ``|``-boundary suffix equals
    ``left`` IS greedy leftmost-non-overlapping pair merging. ``carry``
    columns ride along unchanged (the segmenter keeps the word)."""
    return syms.crossJoin(F.broadcast(best.select("__l", "__r"))).select(
        *carry,
        F.when(F.size("syms") == 1, F.element_at("syms", 1))
        .otherwise(
            F.aggregate(
                F.slice("syms", 2, F.size("syms") - 1),
                F.element_at("syms", 1),
                lambda acc, cur: F.when(
                    (
                        (acc == F.col("__l"))
                        | acc.endswith(F.concat(F.lit("|"), F.col("__l")))
                    )
                    & (cur == F.col("__r")),
                    F.concat(acc, cur),
                ).otherwise(F.concat(acc, F.lit("|"), cur)),
            )
        )
        .alias("w"),
        "freq",
    )


def cooccurrence_word_edges(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_words: int = 3,
) -> DataFrame:
    """Undirected word co-occurrence counts within a ±``window`` token
    window — the graph behind TextRank keyword extraction (Mihalcea &
    Tarau 2004). Returns ``(c, s, w)`` with ``c < s`` lexicographically
    and ``w`` = the number of co-occurrences across the corpus (as
    DOUBLE, ready to feed :func:`~reactive_kinesis_spark.operators.graph
    .pagerank` as an edge weight).

    SINGLE corpus scan: every offset's pairs come from the token array
    itself in ONE generate (``flatten`` over the offset list — no
    positional self-join and no per-offset union re-scanning the
    corpus), then one map-side-combined count on the normalized pair
    key. Documents shorter than ``min_words`` tokens are skipped;
    ``min_words > window`` keeps ``sequence(1, n-offset)`` well-defined
    for every offset."""
    if window < 1:
        raise ValueError("window >= 1 required")
    if min_words <= window:
        raise ValueError("min_words must exceed window")
    offsets = ", ".join(str(o) for o in range(1, window + 1))
    words = docs.select(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit("")).alias("ws")
    ).where(F.size("ws") >= F.lit(min_words))
    pairs = (
        words.select(
            F.explode(
                # per-offset zip_with over two slices — binds ws a constant
                # number of times per offset instead of re-evaluating it per
                # pair inside the lambda body (the bigram-builder fix of
                # operators/lexstats.py, applied to the ±window form)
                F.expr(
                    f"flatten(transform(array({offsets}), o ->"
                    " zip_with(slice(ws, 1, size(ws) - o),"
                    " slice(ws, CAST(1 + o AS INT), size(ws) - o),"
                    " (a, b) -> struct(a AS w1, b AS w2))))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
    )
    return pairs.groupBy(
        F.least("w1", "w2").alias("c"), F.greatest("w1", "w2").alias("s")
    ).agg(F.count(F.lit(1)).cast("double").alias("w"))


def frozen_vocab_oov_flags(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab: tuple[str, ...] = (),
) -> DataFrame:
    """Row-level OOV counts against a FROZEN vocabulary: per document,
    ``(group, n_tokens, n_oov)``. This is the shipped-tokenizer form of
    :func:`oov_rate` — production drift monitoring compares the stream
    against the vocabulary the tokenizer was FIT with, not one re-derived
    per batch (a per-batch vocabulary would move under the measurement).
    Used row-level by the streaming OOV ledger; aggregate the two int
    columns per group for the batch twin.

    Membership is a literal IN set (Catalyst compiles >10 literals to a
    hashed InSet — O(1) per token); for 100k+ entry vocabularies prefer
    the broadcast-join shape of :func:`oov_rate` with a frozen vocab
    frame. Join-free as written: each micro-batch costs one narrow
    projection."""
    if not vocab:
        raise ValueError("vocab must be non-empty (the frozen tokenizer vocab)")
    ws = tokens(text_col)
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(group_col),
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.filter(ws, lambda x: ~x.isin(*vocab))).cast("long").alias("n_oov"),
    )


def _bpe_initial_vocab(
    docs: DataFrame, text_col: str, word_end: str, keep_word: bool = False
) -> DataFrame:
    """Word-frequency table in initial symbol form (chars ``|``-joined +
    the ``word_end`` marker) — the ONE corpus-sized stage of both BPE
    operators. A word containing the ``|`` separator raises loudly
    per-row (``raise_error`` rides the projection at zero cost on clean
    data) instead of silently corrupting the symbol stream."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    guarded = F.when(
        F.col("word").contains("|"),
        F.raise_error(
            F.concat(
                F.lit("bpe: word contains the '|' symbol separator: "),
                F.col("word"),
            )
        ),
    ).otherwise(F.col("word"))
    cols = [
        F.concat(
            F.regexp_replace(guarded, "(.)", "$1|"), F.lit(word_end)
        ).alias("w"),
        "freq",
    ]
    if keep_word:
        cols.insert(0, F.col("word"))
    return vocab.select(*cols)


def bpe_segment(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 6,
    top_n: int = 30,
    word_end: str = "</w>",
) -> DataFrame:
    """Segment the corpus vocabulary under the first ``k`` learned BPE
    merges — the APPLY side of :func:`bpe_merges` (train → segment →
    fertility is the full tokenizer loop): the same deterministic merge
    sequence is learned and applied in one plan, and each word's final
    symbol decomposition is reported for the ``top_n`` most frequent
    words (freq DESC, word ASC — a total order).

    Returns ``(word, freq, segmentation, n_subwords)`` with
    ``segmentation`` the ``|``-joined subword string (``word_end``
    marker included as a symbol). Same certification class as the
    trainer: pure string/int arithmetic.

    100 TB shape: identical to :func:`bpe_merges` (one corpus scan, k
    vocab-sized iterations) — the segmentation IS the trainer's final
    vocab state, so applying costs nothing beyond training; the bounded
    output is a TakeOrdered(top_n)."""
    if k < 1 or top_n < 1:
        raise ValueError("k >= 1 and top_n >= 1 required")
    v = _bpe_initial_vocab(docs, text_col, word_end, keep_word=True).localCheckpoint(
        eager=False
    )
    for _ in range(k):
        syms = v.select("word", F.split("w", r"\|").alias("syms"), "freq")
        best = _bpe_best_pair(syms).localCheckpoint(eager=False)
        v = _bpe_apply_merge(syms, best, carry=("word",)).localCheckpoint(eager=False)
    return (
        v.orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_n)
        .select(
            "word",
            "freq",
            F.col("w").alias("segmentation"),
            F.size(F.split("w", r"\|")).cast("long").alias("n_subwords"),
        )
    )

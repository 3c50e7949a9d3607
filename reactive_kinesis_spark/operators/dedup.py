"""Deduplication operators for LLM training-data pipelines.

Four tiers, all expressed as DataFrame compositions (Catalyst-optimizable,
shuffle-minimal):

* **exact** — group on the text (or its md5 fingerprint), keep the lowest id.
  One shuffle on a hash key; no skew beyond true duplicate groups.
* **n-gram Jaccard** — exact set similarity over word shingles via a
  shingle-inverted-index self-join with a document-frequency cap (hot
  shingles carry no signal and would otherwise produce quadratic blowup).
* **MinHash + LSH** — the 100 TB path: fixed-size signatures (k exact-min
  aggregations), banded bucket join, candidate verification. Cost is
  O(docs·shingles) + O(candidate pairs), never O(pairs).
* **SimHash** — 64-bit bit-vote fingerprints; near-dup = small Hamming
  distance, found via banded chunk join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _persist(df: DataFrame, cache_registry: list | None) -> DataFrame:
    """MEMORY_AND_DISK-persist ``df``; when the caller passed a
    ``cache_registry`` list, append the persisted frame so a long-lived
    session can ``frame.unpersist()`` deterministically instead of relying
    on ``spark.catalog.clearCache()`` (the bench-harness approach). The
    cache entry is keyed by canonicalized plan, so repeated calls on the
    same input reuse one entry rather than leaking new ones."""
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(out)
    return out


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct text; adds ``dup_count``."""
    survivors = (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop(text_col)
    )
    return df.join(survivors, id_col, "inner")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff: per document id, whether it was ``added``,
    ``removed``, ``changed`` (same id, different content), or
    ``unchanged`` between two corpus versions — the ingest-monitoring
    report every incremental pipeline runs before reprocessing (how much
    downstream work did this delta actually create?), and the input to
    "reprocess only added+changed".

    Shape: each side is reduced to ``(id, md5(text))`` BEFORE the join —
    the full-outer join shuffles 8-byte-ish fingerprints keyed by id,
    never document bodies (the :func:`canonical_pick` discipline applied
    to diffing); content comparison is one fingerprint equality. Returns
    ``(id_col, status)`` for every id in either snapshot.

    Presence is carried through the join as EXPLICIT literal markers
    (``__in_old``/``__in_new``), never inferred from fingerprint
    NULL-ness: ``md5(NULL) IS NULL``, so a NULL-text row present only in
    the old snapshot would otherwise be misreported as ``added``. The
    content comparison is null-safe (``eqNullSafe``), so two NULL-text
    versions of the same id compare ``unchanged`` and a NULL→non-NULL
    rewrite is ``changed``.
    """
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__fp_old"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__fp_new"),
        F.lit(True).alias("__in_new"),
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__in_old").isNull(), F.lit("added"))
            .when(F.col("__in_new").isNull(), F.lit("removed"))
            .when(~F.col("__fp_old").eqNullSafe(F.col("__fp_new")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def canonical_pick(
    df: DataFrame,
    order_by: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the BEST copy per exact-duplicate group, by an explicit
    preference order (e.g. ``[F.col("n_chars").desc()]`` — prefer the
    least-truncated copy; ``id_col`` ascending is always the final
    tiebreak, so the pick is total and deterministic). The curation-grade
    refinement of :func:`exact_dedup`, which hard-codes "lowest id":
    real pipelines keep the copy with the best quality signal and drop
    the rest.

    Shape: ONE shuffle, keyed on ``md5(text)`` — a 32-byte fingerprint,
    so the exchange never carries document bodies as keys (the win over
    the groupBy-text formulation when texts are megabytes); the rank
    window and the group-size count window share that exchange. Group
    sizes are duplicate-multiplicities — bounded in practice; a single
    adversarial content replicated corpus-wide concentrates its group in
    one task, the same contract as every exact-dup grouping.

    Returns one row per distinct text: the surviving row's ``id_col``,
    the preference columns, and ``group_size``.

    NULL-text rows are NOT duplicates of each other (``md5(NULL)`` is
    NULL, which would otherwise collapse them into one window group and
    silently drop all but one): each NULL-text row gets a per-id
    sentinel fingerprint, so it forms its own group of size 1 and always
    survives. Internal columns use collision-safe ``__``-prefixed names;
    ``group_size`` is the documented output column (a pre-existing
    ``group_size`` input column is replaced, by contract).
    """
    from pyspark.sql import Window

    # md5 hex is [0-9a-f]{32}; the ':'-bearing sentinel can never collide.
    fp = F.when(
        F.col(text_col).isNull(),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    ).otherwise(F.md5(F.col(text_col))).alias("__fp")
    w = Window.partitionBy("__fp")
    rank_w = w.orderBy(*order_by, F.col(id_col))
    return (
        df.select(id_col, *[c for c in df.columns if c != id_col], fp)
        .withColumn("__rn", F.row_number().over(rank_w))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document: ``(id_col, shingle)``.

    PRECONDITION: ``id_col`` is unique in ``df`` (one row per document).
    Distinctness is per-row (``array_distinct``), so duplicate id rows
    would emit duplicate ``(id, shingle)`` pairs and inflate downstream
    ``n_sh`` counts / Jaccard denominators. The ``documents`` table
    guarantees this; run ``exact_dedup`` first if your corpus does not.

    Pure array ops (``sequence``/``transform``/``explode``) — JVM-side,
    no UDF, linear in total tokens. Per-document distinctness is computed
    with ``array_distinct`` BEFORE the explode — a narrow (zero-shuffle)
    operation, vs. the naive ``explode().distinct()`` which shuffles the
    entire exploded string frame (measured −18% on the Jaccard pipeline at
    sf0.1; at 100 TB it removes the largest exchange in the plan).

    ``hashed=True`` emits ``xxhash64(shingle)`` (a long) instead of the
    string. Downstream dedup consumers only ever group/join on shingle
    identity, so the 8-byte key is semantically interchangeable (up to
    64-bit collisions, ~n²/2⁶⁴). Measured at sf0.1/local[32]: NEUTRAL TO
    SLOWER (the hash costs more than the smaller shuffle saves when
    exchanges are in-memory) — it is a knob for genuinely network-bound
    clusters, so the default stays ``False``.

    The word array is PROJECTED before the gram transform. Inlining
    ``split()`` into the lambda re-evaluates it per ``element_at`` call —
    n×positions split()s per document, quadratic in document length
    (measured 7.7× slower at sf0.1, and worse as documents grow);
    Catalyst does not CSE through the higher-order-function boundary.
    """
    words = F.split(F.col(text_col), " ")
    wdf = df.where(F.size(words) >= n).select(F.col(id_col), words.alias("__words"))
    w = F.col("__words")

    def mk(i: Column) -> Column:
        gram = F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)])
        return F.xxhash64(gram) if hashed else gram

    grams = F.transform(F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))), mk)
    return wdf.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
    cache_shingles: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs ``(id_1, id_2, jaccard)``.

    ``max_df`` drops shingles occurring in more than that many documents from
    the *pairing* step (they would contribute quadratic join blowup and no
    discrimination); denominators still use the full shingle counts, so the
    score is a deterministic, engine-portable lower bound on true Jaccard.

    The df cap is a ``groupBy(shingle).count()`` — partial+final hash
    aggregation with map-side combine, so a hot shingle costs one combined
    row per map task, never one task holding every occurrence — followed by
    a **broadcast anti-join** of the over-cap shingle set. (A windowed
    count over ``partitionBy(shingle)`` was measured faster at sf0.1 but
    materializes every occurrence of the hottest shingle in a single task —
    at 100 TB a 10M-doc shingle is a straggler, so the window idiom is
    deliberately NOT used.)

    The over-cap set is broadcast as 8-byte ``xxhash64(shingle)`` keys, not
    strings — its cardinality is bounded by total_occurrences / max_df (every
    over-cap shingle has > max_df occurrences), so at 10^12 shingle
    occurrences and the default cap the broadcast is ≤ 8 GB even in the
    degenerate all-hot corpus, and ~10-100× smaller than broadcasting the
    strings. A 64-bit collision can only *drop* a rare shingle from the
    pairing step (never add one), preserving the lower-bound contract with
    probability 1 - ~n²/2⁶⁴.

    ``cache_shingles=True`` (default) persists the shingle frame
    (MEMORY_AND_DISK) so its four consumers — per-doc sizes, the df cap,
    and both sides of the pair self-join — share ONE corpus scan+explode
    instead of four (measured 15.8 s → ~6 s at sf0.1; at 100 TB it is the
    difference between one and four reads of the corpus). The cache entry is
    keyed by canonicalized plan, so repeated calls on the same input reuse
    one entry rather than leaking new ones; lifecycle is the session's
    (``spark.catalog.clearCache()`` to drop early, or pass
    ``cache_shingles=False`` for a strictly streaming-shaped plan; or pass
    ``cache_registry=[]`` to receive the persisted frame for an explicit
    ``unpersist()``).
    """
    sh = shingles(df, text_col, id_col, n)
    if cache_shingles:
        sh = _persist(sh, cache_registry)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    over_cap = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") > max_df)
        .select(F.xxhash64("shingle").alias("__och"))
    )
    rare = sh.join(
        F.broadcast(over_cap), F.xxhash64(F.col("shingle")) == F.col("__och"), "left_anti"
    ).select(id_col, "shingle")
    a = rare.select(F.col(id_col).alias("id_1"), "shingle")
    b = rare.select(F.col(id_col).alias("id_2"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({id_col: "id_1", "n_sh": "n_1"}), "id_1")
        .join(sizes.withColumnsRenamed({id_col: "id_2", "n_sh": "n_2"}), "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("n_common").cast("double")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    cache_test_shingles: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Train/test decontamination: per test document, how many of its
    distinct word ``n``-gram shingles also occur anywhere in the train
    corpus — ``(id_col, n_sh, n_hits, contamination)`` with
    ``contamination = n_hits / n_sh``. Filter ``contamination > 0`` (or a
    stricter ratio) to drop leaked evaluation documents before training.

    Shape — **the train corpus is scanned once and NEVER shuffled**, the
    invariant that decides 100 TB viability (shuffling 10^12 train shingles
    is the naive plan's death):

    1. the eval set's distinct shingles are collected and **broadcast**
       (an eval set is small by definition — 10k docs ≈ a few MB of
       shingles; this bound is the operator's contract);
    2. one narrow pass over the train corpus explodes its shingles and
       broadcast-semi-joins them against the eval set — surviving
       ("matched") shingles are ≤ the eval set, so the only shuffle in the
       whole plan is the tiny distinct over them;
    3. matched shingles broadcast back onto the eval shingles for the
       per-document hit counts.

    No doc×doc comparison anywhere; the train side needs no distinct at
    all (semi-join membership is idempotent), which also skips the
    map-side aggregation pass the naive plan pays. A test document with
    fewer than ``n`` words has no shingles and is reported with
    ``n_sh = 0, contamination = 0.0``.

    ``cache_test_shingles`` persists the eval shingle frame so its three
    consumers (sizes, the broadcast build, the hit counts) share one
    scan+explode — same lifecycle contract as ``ngram_jaccard_pairs``
    (session-scoped, plan-keyed; ``spark.catalog.clearCache()`` drops it,
    or pass ``cache_registry=[]`` to receive the frame for ``unpersist()``).
    """
    te = shingles(test, text_col, id_col, n)
    if cache_test_shingles:
        te = _persist(te, cache_registry)
    sizes = te.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    te_sh = te.select("shingle").distinct()
    matched = (
        shingles(train, text_col, id_col, n)
        .join(F.broadcast(te_sh), "shingle", "left_semi")
        .select("shingle")
        .distinct()
    )
    hits = (
        te.join(F.broadcast(matched), "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    all_ids = test.select(id_col).distinct()
    return (
        all_ids.join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_sh", F.lit(0)).alias("n_sh"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(
                F.coalesce("n_sh", F.lit(0)) > 0,
                F.coalesce("n_hits", F.lit(0)).cast("double")
                / F.col("n_sh").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    cache_shingles: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """Span-level exact-duplicate audit ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022, re-expressed relationally):
    per document, the fraction of its distinct word ``n``-gram spans that
    appear verbatim in at least one OTHER document —
    ``(id_col, n_sp, n_dup, dup_frac)``. ``dup_frac = 1.0`` flags a fully
    copied document; intermediate values localize boilerplate/quoted spans
    that exact whole-text dedup misses.

    Shape: one shingle explode (per-doc distinct, so a span's document
    frequency = distinct-doc count with no per-doc dedup pass; persisted
    when ``cache_shingles`` so both consumers share ONE corpus scan+explode
    — the same measured win as the Jaccard pipeline's shared scan), a
    partial+final ``groupBy(shingle).count()`` for the cross-doc span set
    (map-side combined — a hot span costs one row per map task), then ONE
    shingle-keyed join back annotating each span with its dup flag and ONE
    per-doc aggregate computing ``n_sp``/``n_dup`` together (fused: the
    separate sizes/hits aggs were each a full pass over the exploded
    frame). Shuffles are keyed by shingle or doc id, never doc×doc, and —
    unlike the decontamination broadcast, whose eval side is small by
    contract — nothing here is assumed bounded, so no broadcast: the
    dup-span set is corpus-sized in the worst case.
    Documents with fewer than ``n`` words report ``n_sp = 0``.

    Cache lifecycle: session-scoped and plan-keyed like the Jaccard path —
    long-lived sessions should either pass ``cache_registry=[]`` and
    ``unpersist()`` the returned frame when done, or call
    ``spark.catalog.clearCache()`` periodically (as ``bench.py`` does).
    """
    sh = shingles(df, text_col, id_col, n)
    if cache_shingles:
        sh = _persist(sh, cache_registry)
    dup = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") >= 2)
        .select("shingle", F.lit(1).alias("__dup"))
    )
    per_doc = (
        sh.join(dup, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sp"),
            F.count("__dup").alias("n_dup"),  # count(col) skips nulls
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_sp", F.lit(0)).alias("n_sp"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.when(
                F.coalesce("n_sp", F.lit(0)) > 0,
                F.coalesce("n_dup", F.lit(0)).cast("double")
                / F.col("n_sp").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
# Cluster resolution (connected components over near-dup pair edges)
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_1",
    dst_col: str = "id_2",
    max_iterations: int = 50,
    stats: dict | None = None,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Resolve near-duplicate *pairs* into clusters: connected components of
    the pair graph via the alternating large-star/small-star algorithm
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Returns ``(node, component)`` with ``component`` = the minimum
    node id of the cluster, for every node that appears in ``pairs``.

    This is the missing last step of dedup at scale: pair emitters
    (:func:`ngram_jaccard_pairs`, :func:`minhash_lsh_pairs`,
    :func:`simhash_pairs`) produce edges, but "keep one copy per duplicate
    *group*" needs the transitive closure. Label-propagation converges in
    O(diameter) rounds; large-star/small-star converges in O(log n) rounds
    on pathological chains — the difference between 5 and 10,000 shuffles on
    a 100 TB corpus with chained near-dups.

    Each round is two self-contained DataFrame passes (groupBy ``min`` +
    broadcast-eligible join back to the edge list); intermediate frames are
    ``localCheckpoint``-ed to truncate lineage (otherwise the plan doubles
    per round and the driver OOMs planning round ~20). Convergence is
    detected with an order-independent edge-set checksum (count + sum of
    ``xxhash64(u, v)``) — one tiny aggregate action per round.

    The loop is driver-side control flow over fully distributed rounds —
    the same structure GraphX/GraphFrames use; no per-row driver work.

    Pass ``stats={}`` to receive ``stats['rounds']`` (rounds executed until
    the edge-set fixpoint) — tests pin this against the O(log n) bound so a
    regression to linear convergence fails loudly instead of silently
    multiplying shuffles at scale.

    **Adaptive local finish**: the initial convergence checksum already
    counts the deduplicated edges, so when that count is ≤
    ``local_threshold`` the transitive closure runs as a driver-side
    union-find instead of 2-3 distributed rounds (each round = two
    localCheckpoint materializations + a collect — seconds of fixed job
    latency for a graph that fits in one task). The collect is bounded BY
    CONSTRUCTION: 200k edges ≈ 60 MB of driver heap — sized for Python Row
    object overhead (~300 B/edge), not the 16 B of raw payload. Same
    output contract either way
    (``stats['local']`` reports which path ran); pass
    ``local_threshold=0`` to force the distributed loop. This is the AQE
    localness decision applied to the iterative step — near-dup edge sets
    are a vanishing fraction of corpus size (the whole point of dedup), so
    real runs at 100 TB still commonly finish locally, and pathological
    ones fall through to the O(log n) loop untouched.
    """
    u, v = F.col("u"), F.col("v")
    # Canonical undirected edge list, self-loops dropped, deduped.
    edges = (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(u != v)
        .distinct()
        .localCheckpoint()
    )

    def _checksum(e: DataFrame) -> tuple[int, int]:
        # sum the 64-bit hashes in decimal(38,0): a long sum overflows under
        # ANSI mode after ~2^32 edges (and nondeterministically errors)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = _checksum(edges)
    if prev[0] <= local_threshold:
        if stats is not None:
            stats["rounds"] = 0
            stats["local"] = True
        node_type = edges.schema["u"].dataType
        rows = edges.collect()  # bounded by local_threshold by construction
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ru, rv = find(r["u"]), find(r["v"])
            if ru != rv:
                # union by min id keeps the component label = min node
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        nodes = {r["u"] for r in rows} | {r["v"] for r in rows}
        out = [(n, find(n)) for n in sorted(nodes)]
        from pyspark.sql.types import StructField as _SF, StructType as _ST

        return pairs.sparkSession.createDataFrame(
            out, _ST([_SF("node", node_type), _SF("component", node_type)])
        )

    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # Large-star: for every node, attach its LARGER neighbours to the
        # minimum of its neighbourhood (incl. itself). Both edge directions.
        sym = edges.union(edges.select(v.alias("u"), u.alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        edges = (
            sym.join(mins, "u")
            .where(v > u)
            .select(v.alias("u_raw"), F.col("m").alias("v_raw"))
            .select(
                F.least(F.col("u_raw"), F.col("v_raw")).alias("u"),
                F.greatest(F.col("u_raw"), F.col("v_raw")).alias("v"),
            )
            .where(u != v)
            .distinct()
            .localCheckpoint()
        )
        # Small-star: orient edges max→min, attach all smaller neighbours
        # (and the node itself) to the minimum of that neighbourhood.
        oriented = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        attach = oriented.join(mins, "u")
        edges = (
            attach.select(v.alias("u_raw"), F.col("m").alias("v_raw"))
            .union(attach.select(u.alias("u_raw"), F.col("m").alias("v_raw")))
            .select(
                F.least(F.col("u_raw"), F.col("v_raw")).alias("u"),
                F.greatest(F.col("u_raw"), F.col("v_raw")).alias("v"),
            )
            .where(u != v)
            .distinct()
            .localCheckpoint()
        )
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["local"] = False
    # Converged edge set is a star forest: (member, root). Roots themselves
    # appear only on the right side — add their self-mapping.
    members = edges.select(v.alias("node"), u.alias("component"))
    roots = edges.select(u.alias("node")).distinct().withColumn("component", F.col("node"))
    return members.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    src_col: str = "id_1",
    dst_col: str = "id_2",
) -> DataFrame:
    """Cluster assignment for near-dup pairs: ``(doc_id, rep_id,
    cluster_size)`` — ``rep_id`` is the minimum doc id of the connected
    component (the survivor a dedup pass keeps); every clustered doc gets a
    row. Compose with a left-anti join on ``doc_id != rep_id`` to drop
    non-representatives from the corpus."""
    cc = connected_components(pairs, src_col, dst_col)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("rep_id"),
        "cluster_size",
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def _seeded_hash(i: int, col: Column, hash_family: str) -> Column:
    """One member of the k-hash family applied to ``col``.

    ``"xxhash64"`` (default everywhere performance matters): JVM-native,
    whole-stage-codegen'd, 64-bit. ``"md5"``: the engine-portable
    construction ``int(md5('<i>:' || x)[:14], 16)`` — a 56-bit draw any
    SQL engine reproduces verbatim (DuckDB:
    ``CAST(('0x' || substr(md5(i || ':' || x), 1, 14)) AS BIGINT)``),
    which is what lets the MinHash/SimHash queries be HASH-certified
    against an independent oracle instead of rows-only checked. Both
    families are uniform; the sketch quality is identical."""
    if hash_family == "md5":
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), col)), 1, 14), 16, 10
        ).cast("long")
    return F.xxhash64(F.lit(i), col)


#: 2^56 — the md5-family hash range (14 hex chars).
MD5_RANGE = 1 << 56


def minhash_signatures(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """k-min-hash signature per document from a ``(id, shingle)`` frame.

    xxhash64 family: ``hash_i(shingle)`` from :func:`_seeded_hash` —
    k independent JVM-codegen'd hashes.

    md5 family (portable / oracle-certified runs): ONE md5 per shingle,
    k hashes derived by Kirsch-Mitzenmacher double hashing —
    ``hash_i = (h1 + i·h2) mod 2^56`` with ``h1``/``h2`` the digest's
    first/second 14 hex chars (i ≤ 63 keeps ``h1 + i·h2 < 2^62``, inside
    int64). One digest instead of k cut the certified q23's headline
    time ~4× while every step stays verbatim ANSI-SQL-mirrorable (the
    K-M construction is the standard way to get k hashes from two for
    sketches; the minhash estimator quality is preserved).

    Either way the signature is k exact MIN aggregations in one
    partial+final hash-agg pass — map-side combine keeps shuffle volume
    at O(docs·k), not O(shingles·k).
    """
    if hash_family == "md5":
        if num_hashes > 64:
            raise ValueError("md5 family supports num_hashes <= 64 (int64 bound)")
        base = sh.select(F.col(id_col), F.md5("shingle").alias("__d")).select(
            id_col,
            F.conv(F.substring("__d", 1, 14), 16, 10).cast("long").alias("__h1"),
            F.conv(F.substring("__d", 15, 14), 16, 10).cast("long").alias("__h2"),
        )
        aggs = [
            F.min(
                F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"), F.lit(MD5_RANGE))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
        return base.groupBy(id_col).agg(*aggs)
    aggs = [
        F.min(_seeded_hash(i, F.col("shingle"), hash_family)).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _band_candidates(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    hash_family: str,
) -> DataFrame:
    """LSH banding over a :func:`minhash_signatures` frame → distinct
    candidate pairs ``(id_1, id_2)`` with ``id_1 < id_2``. Band key:
    plain string concat of the band's minhash values for the md5 family
    (identical in any engine, no second hash to mirror), xxhash64
    compression otherwise (fixed 8-byte keys — the scale path)."""
    rows_per_band = num_hashes // bands
    if hash_family == "md5":
        band_cols = [
            F.concat_ws(
                ",", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias(f"band_{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                f"band_{b}"
            )
            for b in range(bands)
        ]
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), band_cols[b].alias("h")) for b in range(bands)])
        ).alias("bh"),
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "h"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("id_1"), F.col(f"y.{id_col}").alias("id_2"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    cache_shingles: bool = False,
    cache_registry: list | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    n-gram Jaccard on the candidate set only.

    ``hash_family="md5"`` switches the k-hash family to the portable
    md5-prefix draw (see :func:`_seeded_hash`) and the band key from an
    xxhash64 compression of the band's rows to their plain string concat
    — every step then has a verbatim ANSI-SQL twin, making the whole
    pipeline hash-certifiable against an independent engine. xxhash64
    (default) stays the scale path: JVM-codegen'd hashing and fixed
    8-byte band keys (see SCALING.md for the measured gap).

    With 64 hashes / 16 bands (4 rows per band) the S-curve crosses ~0.7 —
    recall at ``threshold=0.8`` is ≈1 while keeping candidates near-linear.
    Returns ``(id_1, id_2, jaccard)``.

    ``cache_shingles`` persists the shingle frame (MEMORY_AND_DISK) so its
    three consumers (signatures, sizes, candidate verification) share one
    corpus explosion. Measured at sf0.1/local[32] recomputation is CHEAPER
    (the fused scan+explode+distinct pipeline beats materializing the
    exploded string frame), so the default is off; at 100 TB, where the
    scan itself dominates, turn it on (or ``df.localCheckpoint()`` upstream)
    to read the corpus once instead of three times. The cache entry is
    keyed by canonicalized plan (repeat calls on the same input reuse one
    entry, they do not leak new ones) and lives for the session —
    ``spark.catalog.clearCache()`` drops it early.
    """
    # NB: the shingle frame feeds three subtrees (signatures, sizes,
    # candidate verification) — see the cache_shingles docstring for the
    # recompute-vs-persist trade-off. (Also measured: folding the n_sh
    # count into the signature aggregation to share one pass is ~70%
    # SLOWER — the wider agg buffer hurts more than the second shuffle,
    # and ReuseExchange doesn't fire under AQE here; hashed shingle keys —
    # no win here either, see shingles() docstring.)
    sh = shingles(df, text_col, id_col, n)
    if cache_shingles:
        sh = _persist(sh, cache_registry)
    sig = minhash_signatures(sh, id_col, num_hashes, hash_family)
    cand = _band_candidates(sig, id_col, num_hashes, bands, hash_family)
    # verify candidates with exact Jaccard (intersection over union of shingles)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_1"), "shingle")
    b = sh.select(F.col(id_col).alias("id_2"), "shingle")
    common = (
        cand.join(a, "id_1")
        .join(b, ["id_2", "shingle"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({id_col: "id_1", "n_sh": "n_1"}), "id_1")
        .join(sizes.withColumnsRenamed({id_col: "id_2", "n_sh": "n_2"}), "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("n_common").cast("double")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_estimator_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "md5",
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash Jaccard ESTIMATOR (the
    q139/q151 "expose the approximation's error" discipline applied to
    q23's sketch): for every LSH candidate pair, the estimated Jaccard
    (fraction of agreeing minhash components — what a pipeline that skips
    exact verification would act on) next to the exact shingle Jaccard
    and their absolute error. This is the measurement you run before
    deciding a corpus can drop the exact-verification stage at 100 TB
    (where re-reading shingles for every candidate is the expensive leg
    and the estimator alone may be accurate enough).

    Per pair: ``(id_1, id_2, est_jaccard, jaccard, abs_err)`` — both
    ratios are single IEEE divisions of exact ints, the error one
    subtraction + abs, so the audit itself is hash-certifiable. Pairs
    with zero common shingles (possible only via a hash collision) are
    KEPT with ``jaccard = 0`` via a left join — they are exactly the
    maximal-error pairs (high ``est_jaccard``, exact 0) this audit
    exists to surface; an inner verification join would silently hide
    the estimator's worst failures.

    Scale shape = :func:`minhash_lsh_pairs` exactly (banding bounds the
    pair set; signatures join back by id — k int columns per doc, no
    shingle data), plus one k-column signature equality comparison per
    candidate.
    """
    sh = shingles(df, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes, hash_family)
    cand = _band_candidates(sig, id_col, num_hashes, bands, hash_family)
    matches = None
    for i in range(num_hashes):
        term = (F.col(f"x.mh_{i}") == F.col(f"y.mh_{i}")).cast("int")
        matches = term if matches is None else matches + term
    est = (
        cand.join(sig.alias("x"), F.col("id_1") == F.col(f"x.{id_col}"))
        .join(sig.alias("y"), F.col("id_2") == F.col(f"y.{id_col}"))
        .select("id_1", "id_2", matches.alias("n_match"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_1"), "shingle")
    b = sh.select(F.col(id_col).alias("id_2"), "shingle")
    common = (
        cand.join(a, "id_1")
        .join(b, ["id_2", "shingle"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # LEFT join the candidate set to the common-shingle counts: a
    # collision-only candidate (n_common = 0) must appear with jaccard 0
    # and full abs_err, not vanish from its own accuracy audit.
    verified = cand.select("id_1", "id_2").join(
        common, ["id_1", "id_2"], "left"
    ).select(
        "id_1", "id_2", F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common")
    )
    exact = F.col("n_common").cast("double") / (
        F.col("n_1") + F.col("n_2") - F.col("n_common")
    ).cast("double")
    est_j = F.col("n_match").cast("double") / F.lit(float(num_hashes))
    return (
        verified.join(sizes.withColumnsRenamed({id_col: "id_1", "n_sh": "n_1"}), "id_1")
        .join(sizes.withColumnsRenamed({id_col: "id_2", "n_sh": "n_2"}), "id_2")
        .join(est, ["id_1", "id_2"])
        .select(
            "id_1",
            "id_2",
            est_j.alias("est_jaccard"),
            exact.alias("jaccard"),
            F.abs(est_j - exact).alias("abs_err"),
        )
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """``bits``-wide SimHash per document: per-bit vote over hash(word)
    weighted by term frequency; bit set iff the vote is positive.

    Returned as ``(id, simhash_hi, simhash_lo)`` (two signed halves of
    ``bits/2`` bits each, avoiding 64-bit sign pitfalls in downstream
    banding).

    Words are hashed to longs BEFORE the term-frequency shuffle: the
    votes depend only on ``hash(word)``, so grouping by the hash is
    semantically identical while shuffling fixed 8-byte keys instead of
    strings (hash collisions merge tf of colliding words — their vote
    contribution is identical either way).

    ``hash_family="md5"`` uses the engine-portable 56-bit md5-prefix word
    hash (see :func:`_seeded_hash`; pair it with ``bits=56``) so the
    signature — and everything banded from it — is reproducible verbatim
    in ANSI SQL for oracle certification. xxhash64 + ``bits=64`` is the
    scale default.
    """
    if bits % 2 != 0 or not 2 <= bits <= 64:
        raise ValueError(f"bits={bits} must be even and in [2, 64]")
    if hash_family == "md5":
        word_hash = lambda w: F.conv(  # noqa: E731
            F.substring(F.md5(w), 1, 14), 16, 10
        ).cast("long")
    else:
        word_hash = lambda w: F.xxhash64(w)  # noqa: E731
    hashes = F.transform(F.split(F.col(text_col), " "), word_hash)
    words = (
        df.select(F.col(id_col), F.explode(hashes).alias("h"))
        .groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    voted = words.groupBy(id_col).agg(*votes)
    half = bits // 2
    lo = F.lit(0)
    for i in range(half):
        lo = lo + F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    hi = F.lit(0)
    for i in range(half, bits):
        hi = hi + F.when(F.col(f"v_{i}") > 0, F.lit(1 << (i - half))).otherwise(F.lit(0))
    return voted.select(
        F.col(id_col),
        hi.cast("long").alias("simhash_hi"),
        lo.cast("long").alias("simhash_lo"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    cache_signatures: bool = True,
    cache_registry: list | None = None,
    bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming`` over
    ``bits``-wide SimHash, found via the 4-chunk pigeonhole band join
    (any pair within Hamming 3 must agree exactly on ≥1 of 4 chunks of
    ``bits/4`` bits — 16-bit chunks at the 64-bit default, 14-bit at the
    md5 family's 56).

    ``hash_family="md5"`` (with ``bits=56``) makes every step — word
    hash, votes, halves, chunks, Hamming — expressible verbatim in ANSI
    SQL; see :func:`simhash`.

    The signature frame is persisted before the banded self-join by
    default: the two join sides are aliases of the same subtree, and
    attribute aliasing defeats exchange reuse (the q77 finding), so
    without the persist the full explode + 64-vote aggregation pipeline
    executes twice. Signatures are 3 longs per document — the persist is
    corpus-row-count sized, never token-sized."""
    if bits % 4 != 0:
        # a non-multiple-of-4 width would silently leave the top bits of
        # each half out of every pigeonhole chunk — candidate recall
        # degrades with no error. Only 4-divisible widths are sound
        # (56 = md5 family, 64 = xxhash64 family are the tested points).
        raise ValueError(
            f"bits={bits} must be divisible by 4: the 4-chunk pigeonhole "
            "covers every signature bit only then (use 56 for the md5 "
            "family, 64 for xxhash64)"
        )
    if max_hamming > 3:
        # 4 chunks guarantee a shared chunk only for <= 3 differing bits
        raise ValueError(
            f"max_hamming={max_hamming} > 3: the 4-chunk pigeonhole is "
            "complete only for Hamming distance <= 3 — pairs at distance "
            "4+ can differ in every chunk and would be silently missed"
        )
    sig = simhash(df, text_col, id_col, bits=bits, hash_family=hash_family)
    if cache_signatures:
        sig = _persist(sig, cache_registry)
    width = bits // 4  # 2 chunks per half
    mask = (1 << width) - 1
    chunks = sig.select(
        F.col(id_col),
        "simhash_hi",
        "simhash_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash_lo" if c < 2 else "simhash_hi"), (c % 2) * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select(id_col, "simhash_hi", "simhash_lo", F.col("ch.chunk").alias("chunk"), F.col("ch.v").alias("v"))
    x, y = chunks.alias("x"), chunks.alias("y")
    cand = (
        x.join(y, ["chunk", "v"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_1"),
            F.col(f"y.{id_col}").alias("id_2"),
            F.col("x.simhash_hi").alias("hi1"),
            F.col("x.simhash_lo").alias("lo1"),
            F.col("y.simhash_hi").alias("hi2"),
            F.col("y.simhash_lo").alias("lo2"),
        )
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi1").bitwiseXOR(F.col("hi2")))
        + F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2")))
    ).cast("int")
    return cand.select("id_1", "id_2", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def incremental_dedup(
    incoming: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingest exact dedup: of a batch of NEW documents, keep
    only those whose content fingerprint (md5 of the trimmed text) (a) has
    never been seen in the historical corpus and (b) is the first
    occurrence within the batch itself (min ``id_col`` wins —
    deterministic, not arrival order).

    This is the ingestion-time half of :func:`exact_dedup`: a production
    corpus is not re-deduplicated wholesale per ingest; only the delta is
    checked against the accumulated fingerprint set. The streaming twin is
    a stream-static LEFT ANTI join on the same fingerprint (see
    tests/test_streaming.py::test_incremental_dedup_stream_matches_batch).

    Plan shape at 100 TB: the within-batch dedup is one hash shuffle of
    the (small) incoming batch on its fingerprint; the history check is a
    LEFT ANTI join on the same key. Keep the history fingerprints BUCKETED
    by fingerprint (:func:`reactive_kinesis_spark.io.write_bucketed`) and
    the anti join shuffles only the incoming batch — the history side is
    read pre-partitioned and never moves (pinned in tests/test_plans.py).
    md5 keys are uniform, so neither shuffle can skew by construction.
    ``history`` must expose either a ``fingerprint`` column (the stored
    ingest ledger) or ``text_col`` to fingerprint on the fly.
    """
    from reactive_kinesis_spark.operators.text import fingerprint

    inc = incoming.withColumn("fingerprint", fingerprint(text_col))
    first = inc.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    survivors = inc.join(first, ["fingerprint", id_col], "inner")
    if "fingerprint" in history.columns:
        hist = history.select("fingerprint")
    else:
        hist = history.select(fingerprint(text_col).alias("fingerprint"))
    return survivors.join(hist, "fingerprint", "left_anti")


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Train/val/test assignment that can never leak near-duplicates
    across splits: near-dup pair edges are resolved to connected
    components (:func:`dedup_clusters`), every document inherits its
    component representative (``rep_id`` = component min id; documents in
    no pair are their own singleton component), and the split is drawn
    from ``md5(rep_id)`` — so an entire duplicate group lands in ONE
    split by construction. Random per-document splitting (the q117
    shape) leaks: a test document's near-copy in train is measured
    memorization, not generalization (the Lee et al. 2022 dedup paper's
    core finding).

    Returns ``(doc_id, rep_id, cluster_size, split)`` — the split is
    exactly :func:`~reactive_kinesis_spark.operators.text
    .train_val_test_split`'s stable md5-bucket draw, keyed by ``rep_id``
    instead of the document's own id.

    100 TB shape: the pair stage is whatever bounded candidate generator
    produced ``pairs`` (LSH-banded, never doc×doc); components are the
    O(log n)-round star algorithm; the remainder is one id-keyed left
    join + a per-row hash — no extra shuffles beyond the join."""
    from reactive_kinesis_spark.operators.text import train_val_test_split

    comp = dedup_clusters(pairs, "id_1", "id_2").withColumnRenamed("doc_id", "__n")
    base = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == F.col("__n"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep_id"), F.col("doc_id")).alias("rep_id"),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
        )
    )
    return train_val_test_split(base, "rep_id", train=train, val=val)


def pair_ngram_precision(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_registry: list | None = None,
) -> DataFrame:
    """BLEU-style clipped n-gram precision (n = 1, 2) for candidate
    document pairs — the machine-translation-grade overlap metric on a
    dedup pipeline's candidate set. Jaccard (q22/q23) counts DISTINCT
    shared shingles; clipped precision weighs by occurrence (``min`` of
    the two term frequencies, the Papineni et al. 2002 clipping rule), so
    a pair that repeats the same plagiarized sentence ten times scores
    ten times the overlap mass. ``id_1`` plays the BLEU candidate role,
    ``id_2`` the reference.

    ``pairs`` must carry ``id_1 < id_2`` (any bounded candidate source —
    LSH bands, exact-Jaccard pairs, sorted-neighborhood blocks).
    PRECONDITION: each pair's ``id_1`` document must have >= 2 words —
    the unigram and bigram clip frames are inner-joined, so a pair whose
    candidate side has no bigram rows (or no text at all) drops from the
    output entirely rather than surfacing with null bigram columns.
    Shingle-based candidate sources satisfy this by construction (a
    trigram-shingled candidate implies >= 3 words, q179's case); audit
    hand-built pair lists against it before calling. Returns one row per
    qualifying pair: ``clip_1/tot_1/prec_1`` (unigrams) and
    ``clip_2/tot_2/prec_2`` (bigrams). Counts are exact integers;
    each precision is one IEEE division — hash-certified.

    Scale shape: per-doc n-gram counting is one scan + explode; the pair
    scoring is two equi-joins keyed on (doc, gram) — candidate-bounded,
    never doc×doc. No broadcast assumption on any side.
    """
    words = F.split(F.col(text_col), " ")
    # base feeds the unigram AND bigram count frames, and each count frame
    # feeds BOTH sides of its clip join — without persistence that is four
    # corpus tokenizations (pathological when text is a computed column:
    # q197's synthetic corpus is an inline md5 chain). Persist all three so
    # the corpus materializes once and each count aggregate runs once
    # (``cache_registry=[]`` receives the frames for deterministic
    # ``unpersist()`` in long-lived sessions — the module idiom).
    base = _persist(
        docs.where(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("__id"), words.alias("__w")
        ),
        cache_registry,
    )
    uni = _persist(
        base.select("__id", F.explode("__w").alias("g"))
        .groupBy("__id", "g")
        .agg(F.count(F.lit(1)).alias("c")),
        cache_registry,
    )
    big = (
        base.where(F.size("__w") >= 2)
        .select(
            "__id",
            # zip_with over two slices: binds __w once per row (a lambda-body
            # get(__w, i) re-evaluates __w per iteration after projection
            # collapse — pathological when text is a computed column; measured
            # 62s -> ~2s on the q193 synthetic corpus at sf0.1), and with no
            # indexing the ANSI-[]-throws-on-short-rows hazard the old get()
            # comment described is gone by construction
            F.expr(
                "zip_with(slice(__w, 1, size(__w) - 1), slice(__w, 2, size(__w) - 1),"
                " (a, b) -> concat_ws(' ', a, b))"
            ).alias("__bg"),
        )
        .select("__id", F.explode("__bg").alias("g"))
        .groupBy("__id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = _persist(big, cache_registry)

    def _clip(cnt: DataFrame, suffix: str) -> DataFrame:
        a = cnt.select(F.col("__id").alias("id_1"), "g", F.col("c").alias("__ca"))
        b = cnt.select(F.col("__id").alias("id_2"), "g", F.col("c").alias("__cb"))
        return (
            pairs.select("id_1", "id_2")
            .join(a, "id_1")
            .join(b, ["id_2", "g"], "left")
            .groupBy("id_1", "id_2")
            .agg(
                F.sum(F.least("__ca", F.coalesce("__cb", F.lit(0)))).alias(
                    f"clip_{suffix}"
                ),
                F.sum("__ca").alias(f"tot_{suffix}"),
            )
        )
    out = _clip(uni, "1").join(_clip(big, "2"), ["id_1", "id_2"])
    return out.select(
        "id_1",
        "id_2",
        "clip_1",
        "tot_1",
        (F.col("clip_1").cast("double") / F.col("tot_1").cast("double")).alias("prec_1"),
        "clip_2",
        "tot_2",
        (F.col("clip_2").cast("double") / F.col("tot_2").cast("double")).alias("prec_2"),
    )

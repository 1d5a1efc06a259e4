"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), word-set Jaccard, and SimHash near-dup. All distributed, shuffle
on content hashes only (never full texts beyond the first pass), zero
Python UDFs anywhere (SimHash included — md5 + integer bit arithmetic,
all codegen-eligible).

The MinHash family h_i(s) = md5(i || s) with lexicographic min is chosen
deliberately: identical results are computable in any engine with md5
(the DuckDB oracle reproduces signatures exactly — SURVEY.md §5 item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min id."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def dedup_canonical(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonicalized ("fuzzy-exact") duplicate groups: texts are
    lowercased, punctuation-stripped, and whitespace-collapsed before
    hashing, so trivially reformatted copies collapse to one group — the
    standard first pass of real dedup pipelines, one groupBy on the
    canonical hash. The input is scan-spread first: the regex
    canonicalization is the expensive part and on a single-row-group
    input it would otherwise run in one or two scan tasks (r8; no-op on
    pre-split production inputs)."""
    from .spread import scan_spread

    docs = scan_spread(docs)
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.groupBy(F.md5(canon).alias("canon_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 4) -> DataFrame:
    """Character n-gram shingles via sequence+substring (JVM-side, no UDF).

    The doc frame is scan-spread first: the explode + downstream md5
    mins are the expensive part of every minhash pipeline, and on a
    single-row-group input they would otherwise run in ONE scan task
    (r8; no-op on pre-split production inputs)."""
    from .spread import scan_spread

    docs = scan_spread(docs)
    return docs.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1)))
        ).alias("i"),
        F.col(text_col),
    ).select(id_col, F.expr(f"substring({text_col}, i, {n})").alias("sh"))


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature columns sig0..sig{n-1} per document."""
    sh = shingles(docs, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(h)), F.col("sh")))).alias(f"sig{h}")
        for h in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    docs: DataFrame, n_hashes: int = 4, rows_per_band: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: (band, bucket, n_docs, min_doc) occupancy table.
    Candidate pairs = docs sharing any (band, bucket)."""
    sigs = minhash_signatures(docs, n_hashes, text_col, id_col)
    bands = _banded(sigs, n_hashes, rows_per_band, id_col)
    return bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_doc")
    )


def _banded(sigs: DataFrame, n_hashes: int, rows_per_band: int, id_col: str) -> DataFrame:
    """(band, bucket, id): one exploded row per band — a single pass over
    the signatures instead of a per-band union (which would recompute the
    whole shingle+minhash pipeline once per band)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[
                            F.col(f"sig{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                ).alias("bucket"),
            )
            for b in range(n_hashes // rows_per_band)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(entries).alias("__e")).select(
        F.col("__e.band").alias("band"), F.col("__e.bucket").alias("bucket"), id_col
    )


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = 4, rows_per_band: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate near-dup pairs (a < b) from shared LSH buckets.

    Dedup across bands is FIRST-MATCH-BAND (r8): each doc has exactly
    one bucket per band, so emitting a pair at band b only when its
    buckets DIFFER at every earlier band yields each candidate pair
    exactly once — the classic LSH trick that removes the global
    ``distinct`` outright. The pair set is quadratic in bucket occupancy
    (98 M rows at sf1), so that distinct was the dominant exchange: a
    full shuffle + two hash aggregates over the entire pair set, for a
    multiplicity of at most n_bands. Now nothing exchanges after the
    per-band bucket joins (sf1: 141.6 s -> 8.1 s, rows identical).
    Null buckets (null text) never equi-match — same semantics as the
    banded join; the earlier-band inequality uses coalesce(=, false) so
    a null earlier band never suppresses a later real match."""
    sigs = minhash_signatures(docs, n_hashes, text_col, id_col)
    n_bands = n_hashes // rows_per_band

    def bucket(b: int):
        return F.md5(
            F.concat(
                *[F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        )

    bk = sigs.select(
        F.col(id_col), *[bucket(b).alias(f"__b{b}") for b in range(n_bands)]
    )
    # the per-band self-joins reference bk 2 x n_bands times; pin the
    # (narrow: id + n_bands md5s) bucket table once instead of replaying
    # the shingle+minhash lineage per reference (the _pq_artifacts
    # precedent — exchange reuse cannot dedupe across different join keys)
    bk = bk.localCheckpoint(eager=True)
    parts = []
    for b in range(n_bands):
        a, c = bk.alias("a"), bk.alias("b")
        cond = (F.col(f"a.__b{b}") == F.col(f"b.__b{b}")) & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        )
        for p in range(b):
            # "did NOT equi-match at band p": null-safe so a null bucket
            # (which never matches) never suppresses this band's pair
            cond = cond & ~F.coalesce(
                F.col(f"a.__b{p}") == F.col(f"b.__b{p}"), F.lit(False)
            )
        parts.append(
            a.join(c, cond).select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def jaccard_pairs(
    docs: DataFrame, threshold_milli: int = 600, block_col: str = "source",
    text_col: str = "text", id_col: str = "doc_id",
    prefix_filter: bool = True,
    materialize_words: bool = False,
) -> DataFrame:
    """Word-set Jaccard >= threshold within blocking-column groups.
    Integer milli-Jaccard (exact arithmetic, engine-portable).

    ``prefix_filter=True`` (default) bounds the token join with the
    AllPairs prefix principle instead of joining every posting against
    every posting: tokens are globally ordered rarest-first (document
    frequency, then token), and each doc indexes only its first
    ``|d| - ceil(t * |d|) + 1`` tokens. If J(a, b) >= t then
    ``|a ∩ b| >= ceil(t * |a|)``, so the shared tokens cannot all fit in
    a's excluded suffix of size ``ceil(t * |a|) - 1`` — some shared token
    lies in a's prefix, and the prefix-side x full-side join finds every
    qualifying pair. Candidates are then verified with an exact per-pair
    intersection count, so the OUTPUT is identical to the naive join (the
    DuckDB oracle keeps the quadratic formulation as the spec) while the
    join input drops from all postings to the rare-token prefixes —
    the difference between quadratic blow-up and bounded work when the
    vocabulary is Zipfian.
    """
    words = docs.select(
        F.col(id_col), F.col(block_col), F.explode(F.split(text_col, " ")).alias("w")
    ).distinct()
    if materialize_words:
        # the token table feeds df-ranking, sizes, candidate generation AND
        # verification (8 scan subtrees in the lazy plan); at scale,
        # evaluate it once and cut the lineage (exchange reuse only dedupes
        # bit-identical subtrees, not the differing projections here)
        words = words.localCheckpoint(eager=True)
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("nw"))
    if prefix_filter:
        from pyspark.sql import Window

        dfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("__df"))
        rk = Window.partitionBy(id_col).orderBy("__df", "w")
        pre = (
            words.join(dfreq, "w")
            .withColumn("__rk", F.row_number().over(rk))
            .join(sizes, id_col)
            # prefix length nw - ceil(t*nw) + 1 in exact integer arithmetic
            .filter(
                F.col("__rk")
                <= F.col("nw")
                - F.expr(f"div({threshold_milli} * nw + 999, 1000)")
                + 1
            )
            .select(id_col, block_col, "w")
        )
        cand = (
            pre.alias("a")
            .join(
                words.alias("b"),
                (F.col("a.w") == F.col("b.w"))
                & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")),
            )
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .distinct()
        )
        inter = (
            cand.join(words.alias("wa"), F.col("doc_a") == F.col(f"wa.{id_col}"))
            .join(
                words.alias("wb"),
                (F.col("doc_b") == F.col(f"wb.{id_col}"))
                & (F.col("wa.w") == F.col("wb.w")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a, b = words.alias("a"), words.alias("b")
        inter = (
            a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("nw").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("nw").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jacc_milli", F.expr("div(1000 * inter, na + nb - inter)"))
        .filter(F.col("jacc_milli") >= threshold_milli)
        .select("doc_a", "doc_b", "jacc_milli")
    )


def _observed_metric(obs, key: str, timeout_s: float = 300.0):
    """Fetch one observed metric with a bounded wait.

    ``Observation.get`` blocks until the JVM posts metrics at
    SQLExecutionEnd; this Spark build posts them for
    ``localCheckpoint(eager=True)`` (verified), but a build that stopped
    doing so (or Spark Connect) would hang the caller forever. The action
    has already COMPLETED when this is called, so the metrics are either
    already posted or arrive within listener-dispatch latency — a timeout
    here means the assumption broke, and raising beats hanging."""
    import threading

    box: dict = {}

    def _fetch():
        try:
            box["val"] = obs.get
        except Exception as e:  # surface JVM-side errors too
            box["err"] = e

    t = threading.Thread(target=_fetch, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise RuntimeError(
            f"observed metrics not posted within {timeout_s}s after the "
            "checkpoint action finished — this Spark build does not emit "
            "metrics for localCheckpoint(eager=True); replace the "
            "Observation with a separate count() action"
        )
    if "err" in box:
        raise box["err"]
    return box["val"][key]


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair list: (doc_id,
    cluster_id) where cluster_id = the smallest doc id reachable through
    the pair graph — the final step of a dedup pipeline (pairs -> groups
    -> keep one representative per group).

    Distributed min-label propagation with pointer jumping: every node
    starts labeled with itself; each round pulls the minimum label across
    its neighbors AND its current label's own label (lbl(lbl(x)) — valid
    because labels are always ids of reachable nodes and reachability is
    transitive). The jump halves label-chain depth every round, so rounds
    scale with log(diameter) instead of diameter on chain-shaped graphs;
    each round localCheckpoints so lineage does not stack. Deterministic:
    min() has no ties to break. Raises if ``max_iter`` rounds pass without
    convergence rather than returning silently-wrong cluster ids.

    The changed-label count rides the SAME job as the label update (an
    ``Observation`` on the checkpoint materialization) — one Spark action
    per round, not a separate ``count()`` per round. Convergence needs
    one verification round after the last change, so ``max_iter`` must
    exceed the true convergence round count by 1.
    """
    from pyspark.sql import Observation

    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # pointer jump: each node also adopts its label's label
        jump = labels.alias("l1").join(
            labels.alias("l2"), F.col("l1.lbl") == F.col("l2.id")
        ).select(F.col("l1.id").alias("jid"), F.col("l2.lbl").alias("jump_lbl"))
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .join(jump, labels["id"] == jump["jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nbr_lbl"), F.col("lbl")),
                    F.coalesce(F.col("jump_lbl"), F.col("lbl")),
                ).alias("new_lbl"),
                "lbl",
            )
        )
        # the observe node sits UNDER the checkpoint's select, so the
        # eager materialization is the only action of the round and the
        # changed-count falls out of it for free
        obs = Observation()
        labels = (
            new_labels.observe(
                obs, F.sum((F.col("new_lbl") != F.col("lbl")).cast("long")).alias("changed")
            )
            .select("id", F.col("new_lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = int(_observed_metric(obs, "changed") or 0)
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iter} rounds "
            f"(last round changed {changed} labels); allow at least one "
            "more round than the expected convergence count"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def dedup_apply(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """Deduplicated corpus: keep the cluster representative (the doc whose
    id IS its cluster id) plus every unclustered singleton — the actual
    table a training pipeline trains on after pairing + clustering.

    The drop-list is every non-representative duplicate: at 100 TB with
    30-50% dup rates that is billions of ids — far beyond any broadcast.
    The anti-join therefore broadcasts only below a counted threshold
    (the knn_join pattern) and otherwise stays a shuffled anti-join that
    AQE can re-plan."""
    drop = clusters.filter(F.col(id_col) != F.col(cluster_col)).select(id_col)
    if drop.count() <= broadcast_threshold:
        drop = F.broadcast(drop)
    return docs.join(drop, id_col, "left_anti")


def hamming_band_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    block_cols: tuple[str, ...] = (),
    n_hash_bits: int = 64,
) -> DataFrame:
    """All pairs (a < b) within ``max_hamming`` Hamming distance on a
    ``n_hash_bits``-bit hash column, optionally blocked by ``block_cols``.

    Exact by pigeonhole: the hash is split into (max_hamming + 1) disjoint
    bit bands; any pair differing in <= max_hamming positions must match
    exactly in at least one band, so the band-bucket equi-join generates a
    candidate superset and the bit_count(xor) rescore filters it. Replaces
    a within-block O(n^2) self-join with shuffles keyed on (band, bits):
    candidates are bounded by band-bucket occupancy, which for near-uniform
    hash bits is ~n/2^width per block instead of n. All JVM-side
    (shiftright/bit_count — codegen, zero UDFs).
    """
    n_bands = max_hamming + 1
    base, extra = divmod(n_hash_bits, n_bands)
    bands: list[tuple[int, int]] = []  # (bit offset, width)
    off = 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        bands.append((off, w))
        off += w
    # single scan: explode an array of (band, key) structs instead of a
    # per-band union (a union of N selects re-reads the source N times)
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                # arithmetic shift sign-extends, but the mask keeps only
                # the band's own bits, so the top band is still exact.
                # A full-width band (max_hamming=0) needs the all-ones
                # mask spelled as signed -1: (1 << 64) - 1 overflows long
                F.shiftright(F.col(hash_col), off)
                .bitwiseAND(F.lit(-1 if w >= 64 else (1 << w) - 1))
                .alias("bkey"),
            )
            for b, (off, w) in enumerate(bands)
        ]
    )
    keyed = df.select(
        *block_cols, F.col(id_col), F.col(hash_col), F.explode(entries).alias("__e")
    ).select(
        *block_cols,
        id_col,
        hash_col,
        F.col("__e.band").alias("__band"),
        F.col("__e.bkey").alias("__bkey"),
    )
    a, c = keyed.alias("a"), keyed.alias("b")
    join_keys = ["__band", "__bkey", *block_cols]
    # rescore BEFORE dedup: bit_count(xor) is a codegen'd per-row op, so
    # filtering the raw candidate stream first shrinks the distinct()
    # shuffle to (true pairs x matched bands) instead of every candidate
    return (
        a.join(c, join_keys)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn(
            "hamm",
            F.bit_count(F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))),
        )
        .filter(F.col("hamm") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("hamm").cast("int").alias("hamm"),
        )
        .distinct()  # a true pair can match in several bands
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document — fully JVM-side (zero Python UDFs).

    Word hash h(w) = first 16 hex chars of md5(w) as uint64 (split into two
    32-bit halves so signed-long bit ops never overflow). Per doc, each of
    the 64 bit positions accumulates +1/-1 over the DISTINCT word set; the
    output bit at position (63 - j) is set iff the sign-sum for source bit
    j is positive, emitted as a signed two's-complement long. Every step is
    md5 + integer arithmetic -> reproducible in the DuckDB oracle
    (O_SIMHASH), unlike the round-1 per-row Python kernel.
    """
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).distinct()
    h = F.md5(F.col("w"))
    ws = words.select(
        id_col,
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    aggs = []
    for j in range(64):
        src = F.col("lo") if j < 32 else F.col("hi")
        bit = F.shiftright(src, j % 32).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    acc = ws.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(64):
        # shiftleft(1L, 63) wraps to Long.MIN_VALUE — exactly the signed
        # two's-complement encoding of the top bit; the sum of distinct
        # powers of two never carries, so + is equivalent to bitwise-or
        term = F.when(
            F.col(f"s{j}") > 0, F.shiftleft(F.lit(1).cast("long"), 63 - j)
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return acc.select(F.col(id_col), sim.alias("simhash"))


def word_ngrams(
    docs: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ng): DISTINCT word n-grams per document — JVM-side
    (split + sequence + slice + array_join, no UDF). Documents shorter
    than ``n`` words emit nothing."""
    words = F.split(F.col(text_col), " ")
    idxs = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.array_join(F.slice(words, i, n), " "))
    return docs.select(F.col(id_col), F.explode(grams).alias("ng")).distinct()


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per eval document, how many of its
    distinct word n-grams appear anywhere in the training corpus (the
    standard n-gram-overlap leak check run before training). Returns
    (id, n_shared_ngrams, contaminated) for EVERY eval doc, zero-filled.

    Scale shape: both sides reduce to distinct (doc, ngram) postings; the
    train side further collapses to a distinct ngram set, so the overlap
    is one equi-join on the ngram hash + one count per eval doc — never a
    doc-by-doc comparison. The train ngram set shuffles by ngram (its
    size is bounded by corpus vocabulary of n-grams, and the join key is
    content — AQE/broadcast applies when eval is small)."""
    tr = word_ngrams(train, n, text_col, id_col).select("ng").distinct()
    ev = word_ngrams(eval_docs, n, text_col, id_col)
    hits = (
        ev.join(tr, "ng", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        eval_docs.select(id_col)
        .distinct()
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def hamming_cross_contamination(
    train: DataFrame,
    eval_rows: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 10,
    n_hash_bits: int = 64,
) -> DataFrame:
    """Visual decontamination: per eval row, how many TRAIN rows sit
    within ``max_hamming`` bits of its perceptual hash (near-duplicate
    images leaking from eval sets into training data). Same pigeonhole
    banding as ``hamming_band_pairs`` but across two corpora: both sides
    band their hash into (max_hamming + 1) disjoint bit ranges, candidates
    come from the (band, bits) equi-join, and bit_count(xor) rescores
    exactly. Returns (id, n_train_neardups, min_hamming, contaminated)
    for EVERY eval row, zero-filled (min_hamming null when clean)."""
    n_bands = max_hamming + 1
    base, extra = divmod(n_hash_bits, n_bands)
    bands: list[tuple[int, int]] = []
    off = 0
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        bands.append((off, w))
        off += w
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), off)
                .bitwiseAND(F.lit(-1 if w >= 64 else (1 << w) - 1))
                .alias("bkey"),
            )
            for b, (off, w) in enumerate(bands)
        ]
    )

    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(hash_col).alias(f"{prefix}_h"),
            F.explode(entries).alias("__e"),
        ).select(
            f"{prefix}_id",
            f"{prefix}_h",
            F.col("__e.band").alias("__band"),
            F.col("__e.bkey").alias("__bkey"),
        )

    hits = (
        keyed(eval_rows, "ev")
        .join(keyed(train, "tr"), ["__band", "__bkey"])
        .withColumn("hamm", F.bit_count(F.col("ev_h").bitwiseXOR(F.col("tr_h"))))
        .filter(F.col("hamm") <= max_hamming)
        .select("ev_id", "tr_id", "hamm")
        .distinct()  # a true pair can match in several bands
        .groupBy("ev_id")
        .agg(
            F.count(F.lit(1)).alias("n_train_neardups"),
            F.min("hamm").cast("int").alias("min_hamming"),
        )
    )
    return (
        eval_rows.select(F.col(id_col).alias("ev_id"))
        .distinct()
        .join(hits, "ev_id", "left")
        .select(
            F.col("ev_id").alias(id_col),
            F.coalesce("n_train_neardups", F.lit(0)).alias("n_train_neardups"),
            "min_hamming",
            (F.coalesce("n_train_neardups", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def containment_pairs(
    docs: DataFrame, threshold_milli: int = 800, block_col: str = "source",
    text_col: str = "text", id_col: str = "doc_id",
    prefix_filter: bool = True,
) -> DataFrame:
    """Asymmetric word-set CONTAINMENT >= threshold within blocking-column
    groups: C(a in b) = |Wa intersect Wb| / |Wa| as exact integer
    milli-containment. This is the doc-inside-doc signal Jaccard dilutes —
    a paragraph quoted whole inside a 100x larger page has J ~ |Wa|/|Wb|
    (tiny) but C ~ 1.0, and it's exactly the boilerplate-inclusion /
    quotation case an LLM corpus dedup must catch (Broder 1997 splits
    resemblance from containment for this reason). Output is ORDERED
    (contained, container, cont_milli), a != b; a mutual near-dup pair
    appears in both directions.

    The AllPairs prefix principle adapts to the asymmetric threshold: if
    C(a in b) >= t then |a intersect b| >= ceil(t * |a|), so indexing only
    a's rarest-first prefix of length |a| - ceil(t * |a|) + 1 on the
    CONTAINED side (the full posting list on the container side) finds
    every qualifying ordered pair; exact per-pair verification keeps the
    output identical to the naive quadratic spec."""
    if not 1 <= threshold_milli <= 1000:
        raise ValueError(
            f"threshold_milli must be in [1, 1000], got {threshold_milli}"
        )
    words = docs.select(
        F.col(id_col), F.col(block_col),
        F.explode(F.split(text_col, " ")).alias("w"),
    ).distinct()
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("nw"))
    if prefix_filter:
        from pyspark.sql import Window

        dfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("__df"))
        rk = Window.partitionBy(id_col).orderBy("__df", "w")
        pre = (
            words.join(dfreq, "w")
            .withColumn("__rk", F.row_number().over(rk))
            .join(sizes, id_col)
            .filter(
                F.col("__rk")
                <= F.col("nw")
                - F.expr(f"div({threshold_milli} * nw + 999, 1000)")
                + 1
            )
            .select(id_col, block_col, "w")
        )
        cand = (
            pre.alias("a")
            .join(
                words.alias("b"),
                (F.col("a.w") == F.col("b.w"))
                & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")),
            )
            .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("contained"),
                F.col(f"b.{id_col}").alias("container"),
            )
            .distinct()
        )
        inter = (
            cand.join(words.alias("wa"), F.col("contained") == F.col(f"wa.{id_col}"))
            .join(
                words.alias("wb"),
                (F.col("container") == F.col(f"wb.{id_col}"))
                & (F.col("wa.w") == F.col("wb.w")),
            )
            .groupBy("contained", "container")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        a, b = words.alias("a"), words.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.w") == F.col("b.w"))
                & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")),
            )
            .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            .groupBy(
                F.col(f"a.{id_col}").alias("contained"),
                F.col(f"b.{id_col}").alias("container"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("contained"), F.col("nw").alias("na"))
    return (
        inter.join(sa, "contained")
        .withColumn("cont_milli", F.expr("div(1000 * inter, na)"))
        .filter(F.col("cont_milli") >= threshold_milli)
        .select("contained", "container", "cont_milli")
    )

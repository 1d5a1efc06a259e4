"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure column arithmetic (length/replace tricks) — WholeStageCodegen
end to end, zero UDFs, and expressible verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# marker words per language for the n-gram-free language-ID heuristic
LANG_MARKERS = {
    "en": [" the ", " a "],
    "es": [" el ", " la "],
    "fr": [" le ", " la "],
    "de": [" der ", " die "],
}


def _count_occurrences(col, needle: str):
    """Occurrences of ``needle`` via the length-difference trick (exact,
    no regex dialect issues)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text_col) -> F.Column:
    """Whitespace token count: spaces + 1."""
    return (
        F.length(text_col) - F.length(F.replace(text_col, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


def quality_metrics(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tokens, the_cnt, avg_wlen_milli, n_chars_ok)."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    tokens = token_count(t)
    return docs.select(
        F.col(id_col),
        tokens.alias("tokens"),
        _count_occurrences(padded, " the ").alias("the_cnt"),
        F.expr(
            f"div(1000 * (length({text_col}) - (length({text_col}) - "
            f"length(replace({text_col}, ' ', '')) + 1) + 1), "
            f"length({text_col}) - length(replace({text_col}, ' ', '')) + 1)"
        ).alias("avg_wlen_milli"),
        (F.col("n_chars") == F.length(t)).alias("n_chars_ok"),
    )


def _lang_score_cols(text_col: str):
    """One marker-count Column per language (shared by lang_id and
    doc_scorecard so both stay single-scan)."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    return {
        lang: sum(
            (_count_occurrences(t, m) for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language score per language + argmax guess (greatest()
    with deterministic first-wins tie-break by fixed language order)."""
    scores = _lang_score_cols(text_col)
    df = docs.select(
        F.col(id_col), *[c.alias(f"score_{lang}") for lang, c in scores.items()]
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.lit("unk")
    for lang in reversed(langs):  # earlier langs win ties
        guess = F.when((F.col(f"score_{lang}") == best) & (best > 0), lang).otherwise(guess)
    return df.withColumn("guess", guess)


def regex_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-style pre-tokenizer counts: alpha runs, digit runs, and single
    punctuation marks as separate tokens (the GPT-2 pre-tokenizer shape),
    next to the plain whitespace count. regexp_extract_all with
    dialect-safe character classes — identical in the DuckDB oracle."""
    t = F.col(text_col)

    def n(pat: str) -> F.Column:
        return F.size(
            F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)")
        ).cast("long")

    return docs.select(
        F.col(id_col),
        token_count(t).alias("ws_tokens"),
        n("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]").alias("bpe_tokens"),
        n("[a-zA-Z]+").alias("alpha_tokens"),
        n("[0-9]+").alias("digit_tokens"),
        n("[^a-zA-Z0-9 ]").alias("punct_tokens"),
    )


def _ngram_total_distinct(text_col: str, n: int):
    """(n_ngrams, n_distinct) Columns for space-token n-grams (shared by
    ngram_repetition and doc_scorecard)."""
    toks = F.split(F.col(text_col), " ")
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("long")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + d) for d in range(n)]
        ),
    )
    # sequence(1, m) flips to a DESCENDING range when m < 1 — guard so
    # short docs get an empty gram list, not a phantom one
    distinct = F.when(
        total > 0, F.size(F.array_distinct(grams)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return total, distinct


def ngram_repetition(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document n-gram repetition ratio — the Gopher-style quality
    filter that catches boilerplate/looping text: rep_milli =
    1000 * (n_ngrams - n_distinct) // n_ngrams over space-token n-grams
    (0 when the doc has fewer than ``n`` tokens). Pure column arithmetic
    (split -> sequence -> transform -> array_distinct): WholeStageCodegen,
    no shuffle, and the oracle replays it with list functions."""
    total, distinct = _ngram_total_distinct(text_col, n)
    base = docs.select(
        F.col(id_col), total.alias("n_ngrams"), distinct.alias("n_distinct")
    )
    return base.withColumn(
        "rep_milli",
        F.when(
            F.col("n_ngrams") > 0,
            F.expr("div(1000 * (n_ngrams - n_distinct), n_ngrams)"),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking (the pretraining/RAG sequence
    splitter): chunk i covers space-tokens [i*stride, i*stride +
    chunk_tokens), stride = chunk_tokens - overlap; the last chunk may
    be short and every doc emits at least one chunk. All JVM — split +
    integer chunk count + posexplode(sequence) + slice + array_join;
    the only row expansion is the chunk fan-out itself."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    nchunks = F.expr(
        f"1 + CAST(div(greatest(size(split({text_col}, ' ')) - {chunk_tokens}, 0)"
        f" + {stride - 1}, {stride}) AS INT)"
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(F.sequence(F.lit(0), nchunks - 1)).alias("__p", "chunk_idx"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# dialect-portable PII patterns (valid in Java regex AND RE2/DuckDB):
# plain classes, bounded repeats, \d and \b only
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_DIGITS = r"\b\d{7,}\b"


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub for training corpora: count and replace emails, bare
    IPv4 addresses, and long digit runs (phone-/account-number shaped)
    with typed placeholders. Replacement order matters — emails first
    (they contain digit runs), then IPs (dotted digits), then the digit
    sweep. Pure JVM regexp expressions; the oracle replays the identical
    RE2-compatible patterns (DuckDB needs the 'g' flag — Spark's
    regexp_replace is global by default)."""
    t = F.col(text_col)

    # column-API pattern args (NOT F.expr): a SQL string literal would
    # eat the \d / \b escapes
    def n(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    clean = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4, "<IP>")
    clean = F.regexp_replace(clean, PII_DIGITS, "<NUM>")
    return docs.select(
        F.col(id_col),
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IPV4).alias("n_ips"),
        n(PII_DIGITS).alias("n_digit_runs"),
        clean.alias("clean_text"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content + affix fingerprints (md5)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.md5(t).alias("fp_full"),
        F.md5(F.concat(F.substring(t, 1, 16), F.substring(t, -16, 16))).alias("fp_affix"),
    )


def distinctive_terms(
    docs: DataFrame,
    k: int = 3,
    idf_scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` distinctive terms per document by integer tf-idf:
    ``score = tf * idf_scale // df`` (term frequency in the doc times a
    scaled inverse document frequency — integer division only, so the
    ranking is exact and engine-independent; the classic log-idf is a
    monotone transform of 1/df and changes the top-k only via float
    rounding, which is exactly what this formulation removes). Ties
    break by term ascending. Terms are lowercase ASCII-alpha runs.

    Plan: explode to (doc, term) counts (one shuffle), document
    frequency via a term groupBy (second shuffle, vocabulary-bounded
    output), then the df dimension joins BACK by term — broadcastable
    at any corpus size since vocabulary grows sublinearly — and a
    bounded per-doc window takes the top k. Emits
    (doc_id, rnk, term, tf, df, score).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_dim = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_dim), "term").withColumn(
        "score", F.expr(f"tf * {idf_scale} div df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "term", "tf", "df", "score")
    )


def vocab_growth(
    docs: DataFrame,
    steps: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary growth curve (the Heaps'-law diagnostic a corpus
    builder watches while scaling data): for each of ``steps`` prefixes
    of the corpus in ``id_col`` order, emit
    (step, n_docs, boundary_id, total_tokens, vocab) where ``vocab`` is
    the number of DISTINCT lowercase alpha terms seen in the prefix and
    ``total_tokens`` the prefix token count. Prefix k covers the first
    ``N * k // steps`` documents.

    Plan: each term maps to its FIRST containing doc (one groupBy —
    min over the term's postings), so vocabulary-at-step becomes a
    count of first-appearances <= boundary: the corpus is scanned ONCE
    regardless of step count, where the naive formulation (the DuckDB
    oracle, deliberately) re-scans the prefix per step. Both the
    boundary ranks and the counts are exact integers. The per-doc rank
    runs over doc IDS ONLY (two narrow columns), via the
    range-partitioned two-pass ``range_ranked`` (r8) — no single-task
    global sort, and ``n_total`` rides the offset pass instead of a
    separate count action.
    """
    from .rank import range_ranked

    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    terms = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("term"),
    )
    per_doc = terms.groupBy("doc").agg(F.count(F.lit(1)).alias("n_tok"))
    # docs with no alpha tokens still advance the prefix: left join back
    ids = docs.select(F.col(id_col).alias("doc")).join(per_doc, "doc", "left").select(
        "doc", F.coalesce("n_tok", F.lit(0)).alias("n_tok")
    )
    ranked, n_total = range_ranked(ids, ["doc"], "rn")
    bounds = [
        (k, n_total * k // steps) for k in range(1, steps + 1) if n_total * k // steps > 0
    ]
    bdf = ranked.sparkSession.createDataFrame(
        bounds, schema="step int, n_docs long"
    )
    # the broadcast hint goes on the two INNER-join probe sites only: a
    # blanket hint on bounds_ids also landed on the preserved (left) side
    # of the final left-outer join below, where Spark cannot build and
    # silently dropped it (HintErrorLogger noise the sweep now fails on)
    bounds_ids = bdf.join(ranked, bdf["n_docs"] == ranked["rn"]).select(
        "step", "n_docs", F.col("doc").alias("boundary_id")
    )
    first_doc = terms.groupBy("term").agg(F.min("doc").alias("first_doc"))
    vocab = (
        first_doc.join(
            F.broadcast(bounds_ids),
            F.col("first_doc") <= F.col("boundary_id"),
            "inner",
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    b2 = F.broadcast(bounds_ids)
    toks = (
        ranked.join(b2, ranked["rn"] <= b2["n_docs"], "inner")
        .groupBy("step")
        .agg(F.sum("n_tok").alias("total_tokens"))
    )
    return (
        bounds_ids.join(vocab, "step", "left")
        .join(toks, "step", "left")
        .select(
            "step", "n_docs", "boundary_id",
            F.coalesce("total_tokens", F.lit(0)).alias("total_tokens"),
            F.coalesce("vocab", F.lit(0)).alias("vocab"),
        )
    )


def ngram_counts(
    docs: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus bigram counts — the n-gram language-model table (the
    KenLM-style count collection pass): lowercase alpha tokens, adjacent
    pairs joined with one space, aggregated corpus-wide and thresholded
    at ``min_count`` (the standard LM count-pruning knob). Emits
    (bigram, n).

    Plan: tokens stay an ARRAY inside the row (no per-token shuffle);
    the adjacent-pair construction is one ``transform`` over a slice —
    pure codegen — and only the exploded bigrams hit the single
    map-side-combined groupBy. At 100x the corpus the shuffle carries
    (bigram, partial count), bounded by vocabulary^2 crossed with the
    Zipf tail the threshold then cuts.
    """
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    bigrams = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "(t, i) -> concat(t, ' ', __toks[i + 1]))"
    )
    return (
        docs.withColumn("__toks", toks)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def charset_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Charset hygiene metrics — the mojibake/binary-junk filter signals
    of a web-corpus cleaner: per doc, exact counts of printable-ASCII /
    alpha / digit / space characters, the non-ASCII remainder, and
    ``ascii_milli = 1000 * n_ascii // n_chars`` (0 for empty text).
    Pure column expressions (length of class-stripped regexp_replace —
    no explode, no UDF), one narrow projection per row.
    """
    t = F.col(text_col)

    def n_of(cls: str) -> F.Column:
        return F.length(t) - F.length(F.regexp_replace(t, cls, ""))

    n_chars = F.length(t)
    n_ascii = n_of("[ -~]")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_ascii.alias("n_ascii"),
        n_of("[A-Za-z]").alias("n_alpha"),
        n_of("[0-9]").alias("n_digit"),
        n_of("[ ]").alias("n_space"),
        (n_chars - n_ascii).alias("n_nonascii"),
        F.when(n_chars > 0, F.expr(
            f"1000 * (length({text_col}) - length(regexp_replace({text_col}, '[ -~]', ''))) "
            f"div length({text_col})"
        )).otherwise(F.lit(0)).alias("ascii_milli"),
    )


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source contamination audit: exact bigram-set Jaccard
    between every pair of sources — "how much does corpus A repeat
    corpus B", the decision input for dedup-across-sources. Returns
    (src_a, src_b, n_a, n_b, n_common, jaccard_milli) for src_a <
    src_b, all integers (jaccard in truncated milli).

    Plan: tokens stay arrays in-row; only distinct (source, bigram)
    pairs shuffle (vocabulary-bounded), then one self-join keyed on the
    bigram — never a doc-level cross. Source count is small by nature,
    so the pair rollup is tiny."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    bigrams = F.expr(
        "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
        "(t, i) -> concat(t, ' ', __toks[i + 1]))"
    )
    sb = (
        docs.select(F.col(source_col).alias("src"), toks.alias("__toks"))
        .select("src", F.explode(bigrams).alias("bg"))
        .distinct()
    )
    sizes = sb.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    a = sb.select(F.col("src").alias("src_a"), "bg")
    b = sb.select(F.col("src").alias("src_b"), "bg")
    common = (
        a.join(b, "bg")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("src", "src_a").withColumnRenamed("n", "n_a"), "src_a")
        .join(sizes.withColumnRenamed("src", "src_b").withColumnRenamed("n", "n_b"), "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_common",
            F.expr(
                "CAST(1000 * n_common AS BIGINT) div (n_a + n_b - n_common)"
            ).alias("jaccard_milli"),
        )
    )


def dup_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document duplicate-span coverage — the exact-substring
    dedup signal (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): for every doc with at least ``k`` space
    tokens, how many of its k-token windows occur verbatim in ANOTHER
    document, plus dup_milli = 1000 * n_dup // n_windows. Within-doc
    repeats are ``ngram_repetition``'s job; a window counts here only
    when >= 2 DISTINCT docs contain it. Returns
    (id, n_windows, n_dup_windows, dup_milli); docs shorter than ``k``
    tokens are absent.

    Plan: split -> sequence -> transform (WholeStageCodegen) fans each
    doc into its windows with no Python; ONE shuffle on the window key
    builds the per-(window, doc) histogram, a count-over-window marks
    shared windows on the same partitioning (no second exchange), and
    one doc-keyed rollup finishes. The window STRING is the key for
    oracle exactness — at 100 TB swap it for xxhash64(window): same
    plan shape, 8-byte shuffle keys, collisions only merge spans."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    toks = F.split(F.col(text_col), " ")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + d) for d in range(k)]
        ),
    )
    w = docs.filter(F.size(toks) >= k).select(
        F.col(id_col), F.explode(wins).alias("__win")
    )
    g = w.groupBy("__win", id_col).agg(F.count(F.lit(1)).alias("__cnt"))
    g2 = g.withColumn(
        "__nd", F.count(F.lit(1)).over(Window.partitionBy("__win"))
    )
    return (
        g2.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_windows"),
            F.sum(
                F.when(F.col("__nd") >= 2, F.col("__cnt")).otherwise(F.lit(0))
            ).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_milli", F.expr("div(1000 * n_dup_windows, n_windows)")
        )
    )


def doc_scorecard(
    docs: DataFrame,
    n_rep: int = 3,
    k_dup: int = 8,
    min_tokens: int = 20,
    rep_max_milli: int = 200,
    dup_max_milli: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The curation scorecard — every per-document quality signal the
    engine computes, in ONE frame with the final keep decision: token
    count, within-doc n-gram repetition (Gopher boilerplate), CROSS-doc
    duplicate-span coverage (Lee et al.), and the marker-word language
    guess. keep = tokens >= min_tokens AND rep_milli <= rep_max_milli
    AND dup_milli <= dup_max_milli — the integer-exact filter a corpus
    build applies before packing (``corpus_prep``'s decision surface,
    made auditable per doc). Returns (id, tokens, rep_milli, dup_milli,
    guess, keep). Docs shorter than ``k_dup`` tokens have no dup
    windows: dup_milli 0.

    Plan: tokens, repetition and the language guess are pure codegen
    over ONE scan; only the cross-doc dup signal needs its window-key
    shuffle (a second scan), joined back by doc id. No Python, no
    quadratic work."""
    toks_expr = F.size(F.split(F.col(text_col), " ")).cast("long")
    total, distinct = _ngram_total_distinct(text_col, n_rep)
    scores = _lang_score_cols(text_col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*scores.values())
    guess = F.lit("unk")
    for lang in reversed(langs):  # earlier langs win ties
        guess = F.when((scores[lang] == best) & (best > 0), lang).otherwise(guess)
    base = (
        docs.select(
            F.col(id_col),
            toks_expr.alias("tokens"),
            total.alias("__ng"),
            distinct.alias("__nd"),
            guess.alias("guess"),
        )
        .withColumn(
            "rep_milli",
            F.when(F.col("__ng") > 0, F.expr("div(1000 * (__ng - __nd), __ng)"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("__ng", "__nd")
    )
    dup = dup_spans(docs, k=k_dup, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("dup_milli")
    )
    out = base.join(dup, id_col, "left").withColumn(
        "dup_milli", F.coalesce(F.col("dup_milli"), F.lit(0)).cast("long")
    )
    return out.select(
        id_col, "tokens", "rep_milli", "dup_milli", "guess",
        (
            (F.col("tokens") >= min_tokens)
            & (F.col("rep_milli") <= rep_max_milli)
            & (F.col("dup_milli") <= dup_max_milli)
        ).alias("keep"),
    )


# octave dim shared verbatim with the DuckDB oracle: k, [2^k, 2^(k+1)-1]
FREQ_OCTAVES_SQL = ", ".join(
    f"({k}, {1 << k}, {(1 << (k + 1)) - 1})" for k in range(41)
)


def freq_spectrum(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus FREQUENCY SPECTRUM — the Zipf/Heaps diagnostic plotted as
    word-frequency octaves: for every k, how many distinct words occur
    between 2^k and 2^(k+1)-1 times, and how many tokens they carry.
    Octave 0 is the hapax count (the single strongest signal of OCR
    noise and dedup health a corpus builder tracks); a healthy Zipfian
    corpus decays n_words roughly geometrically across octaves, and a
    bump at high octaves is boilerplate that dedup missed. Returns
    (octave, n_words, n_tokens) — sketch-sized output.

    Plan: one token-frequency rollup (map-side combined), then an
    octave-range join against a 41-row literal dim shared VERBATIM with
    the oracle (FREQ_OCTAVES_SQL) — no log2 float anywhere, so octave
    boundaries cannot drift between engines."""
    freqs = (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    oct_dim = F.expr(
        f"explode(array({', '.join(f'struct({k} AS k, {1 << k}L AS lo, {(1 << (k + 1)) - 1}L AS hi)' for k in range(41))}))"
    )
    dim = docs.sparkSession.range(1).select(oct_dim.alias("o")).select(
        F.col("o.k").alias("octave"), F.col("o.lo").alias("lo"),
        F.col("o.hi").alias("hi"),
    )
    return (
        freqs.join(
            F.broadcast(dim),
            (F.col("freq") >= F.col("lo")) & (F.col("freq") <= F.col("hi")),
        )
        .groupBy("octave")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("freq").alias("n_tokens"),
        )
        .select(F.col("octave").cast("long"), "n_words", "n_tokens")
    )

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


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 4) -> DataFrame:
    """Character n-gram shingles via sequence+substring (JVM-side, no UDF)."""
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
    bands = None
    for b in range(n_hashes // rows_per_band):
        cols = [f"sig{b * rows_per_band + r}" for r in range(rows_per_band)]
        part = sigs.select(
            F.lit(b).alias("band"), F.md5(F.concat(*cols)).alias("bucket"), F.col(id_col)
        )
        bands = part if bands is None else bands.unionByName(part)
    return bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_doc")
    )


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = 4, rows_per_band: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Distinct candidate near-dup pairs (a < b) from shared LSH buckets."""
    sigs = minhash_signatures(docs, n_hashes, text_col, id_col)
    pairs = None
    for b in range(n_hashes // rows_per_band):
        cols = [f"sig{b * rows_per_band + r}" for r in range(rows_per_band)]
        keyed = sigs.select(F.md5(F.concat(*cols)).alias("bucket"), F.col(id_col))
        a = keyed.alias("a")
        c = keyed.alias("b")
        p = a.join(c, "bucket").filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def jaccard_pairs(
    docs: DataFrame, threshold_milli: int = 600, block_col: str = "source",
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Word-set Jaccard >= threshold within blocking-column groups.
    Integer milli-Jaccard (exact arithmetic, engine-portable)."""
    words = docs.select(
        F.col(id_col), F.col(block_col), F.explode(F.split(text_col, " ")).alias("w")
    ).distinct()
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("nw"))
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

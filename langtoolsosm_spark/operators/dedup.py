"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), word-set Jaccard, and SimHash near-dup. All distributed, shuffle
on content hashes only (never full texts beyond the first pass), no
per-row Python except the SimHash bit kernel (vectorized mapInPandas).

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
    """64-bit SimHash per document (vectorized bit kernel over Arrow
    batches; md5-based word hashes for engine independence)."""
    import hashlib

    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                acc = np.zeros(64, dtype=np.int64)
                for w in set(text.split(" ")):
                    h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc += np.where(bits == 1, 1, -1)
                v = 0
                for b in (acc > 0).astype(int):
                    v = (v << 1) | int(b)
                out.append((doc_id, v - (1 << 64) if v >= (1 << 63) else v))
            yield pd.DataFrame(out, columns=[id_col, "simhash"])

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, simhash long"
    )

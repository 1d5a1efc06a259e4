"""kNN join via expanding cell-disk equi-joins + window top-k.

Reference analogue: the interactive "nearest plausible name" selection in
translate_with_wikidata (/root/reference/src/translate_with_wikidata.py:
158-217) generalized to *k nearest named features per image* for caption
enrichment (SURVEY.md §2.3 "kNN join", §2.5 "Top-k nearest").

Algorithm (exact kNN, no approximation):
* both sides get their grid cell at resolution ``res``;
* round i explodes each unresolved point into its cell-disk of Chebyshev
  radius R_i (doubling schedule), equi-joins features on cell, and takes
  the top-k by distance per point (window row_number);
* a point is RESOLVED when it has k neighbors and its kth distance is <=
  the guaranteed lower bound of any cell beyond the explored disk
  (R * cell_lat_extent degrees, the smaller axis for |lat| < 60°) — so
  results equal brute-force kNN exactly;
* the few stragglers after ``max_ring`` (isolated points in empty space)
  fall back to a brute-force join against the (small, broadcast) feature
  dim — in production with a dense feature table this path never fires.

Determinism: tie-break by (distance, feature id) everywhere, so output is
identical at any parallelism (SURVEY.md §7.3 determinism).

Metrics: ``euclid_deg`` (squared degrees; bit-reproducible in the DuckDB
oracle) or ``haversine`` (meters).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from ..functions import geo
from ..functions.cells import tile_key_col


def _disk_cells_udf(res: int, radius: int):
    """pandas UDF: (lat, lon) -> array of flat tile keys within Chebyshev
    ``radius`` of the point's cell (lon wraps, lat clamps)."""
    import numpy as np

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        n = np.int64(1) << res
        fx = (lon.to_numpy(dtype=np.float64) + 180.0) / 360.0
        fy = (lat.to_numpy(dtype=np.float64) + 90.0) / 180.0
        ix = np.clip(np.floor(fx * n).astype(np.int64), 0, n - 1)
        iy = np.clip(np.floor(fy * n).astype(np.int64), 0, n - 1)
        offs = np.arange(-radius, radius + 1, dtype=np.int64)
        dx, dy = np.meshgrid(offs, offs, indexing="ij")
        dx, dy = dx.ravel(), dy.ravel()  # (D,)
        nx = np.mod(ix[:, None] + dx[None, :], n)
        ny = iy[:, None] + dy[None, :]
        valid = (ny >= 0) & (ny < n)
        keys = nx * n + ny
        out = [keys[i][valid[i]].tolist() for i in range(len(keys))]
        return pd.Series(out)

    return f


def _dist_col(metric: str, lat1, lon1, lat2, lon2):
    if metric == "euclid_deg":
        # pure column arithmetic — WholeStageCodegen, SQL-parity
        return (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)
    if metric == "haversine":
        @F.pandas_udf(T.DoubleType())
        def hav(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
            return pd.Series(geo.haversine_m(a.to_numpy(), b.to_numpy(), c.to_numpy(), d.to_numpy()))

        return hav(lat1, lon1, lat2, lon2)
    raise ValueError(f"unknown metric {metric}")


def knn_join(
    points: DataFrame,
    features: DataFrame,
    k: int = 3,
    res: int = 7,
    point_id: str = "image_id",
    feature_id: str = "id",
    metric: str = "euclid_deg",
    max_ring: int = 16,
) -> DataFrame:
    """Exact k-nearest-features per point.

    Returns (point_id, neighbor_id, rank, dist). ``points`` needs
    (point_id, lat, lon); ``features`` needs (feature_id, lat, lon).
    """
    cell_lat_deg = 180.0 / (1 << res)

    pts = points.select(
        F.col(point_id).alias("__pid"), F.col("lat").alias("__plat"), F.col("lon").alias("__plon")
    )
    feats = features.select(
        F.col(feature_id).alias("neighbor_id"),
        F.col("lat").alias("__flat"),
        F.col("lon").alias("__flon"),
    ).withColumn("__fcell", tile_key_col(F.col("__flat"), F.col("__flon"), res))
    feats = feats.persist()

    resolved_parts: list[DataFrame] = []
    unresolved = pts
    radius = 1
    while radius <= max_ring:
        exploded = unresolved.withColumn(
            "__cells", _disk_cells_udf(res, radius)(F.col("__plat"), F.col("__plon"))
        ).withColumn("__cell", F.explode("__cells")).drop("__cells")

        cand = exploded.join(feats, exploded["__cell"] == feats["__fcell"], "inner")
        cand = cand.withColumn(
            "dist",
            _dist_col(metric, F.col("__plat"), F.col("__plon"), F.col("__flat"), F.col("__flon")),
        )
        w = Window.partitionBy("__pid").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("__pid", "__plat", "__plon", "neighbor_id", "rank", "dist")
        )
        # resolution check: k found AND kth dist within the guaranteed bound
        bound_deg = radius * cell_lat_deg
        bound = bound_deg * bound_deg if metric == "euclid_deg" else (bound_deg * 111_194.9) ** 2
        kth = topk.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("__n"), F.max("dist").alias("__kth")
        )
        kth_bound = F.col("__kth") <= F.lit(bound) if metric == "euclid_deg" else (
            F.col("__kth") * F.col("__kth") <= F.lit(bound)
        )
        done_ids = kth.filter((F.col("__n") == k) & kth_bound).select("__pid")
        resolved_parts.append(
            topk.join(F.broadcast(done_ids), "__pid", "left_semi")
        )
        unresolved = unresolved.join(F.broadcast(done_ids), "__pid", "left_anti")
        if unresolved.limit(1).count() == 0:
            unresolved = None
            break
        radius *= 2

    if unresolved is not None:
        # brute-force stragglers (few): cross join against the feature dim
        cand = unresolved.crossJoin(F.broadcast(feats.drop("__fcell")))
        cand = cand.withColumn(
            "dist",
            _dist_col(metric, F.col("__plat"), F.col("__plon"), F.col("__flat"), F.col("__flon")),
        )
        w = Window.partitionBy("__pid").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
        resolved_parts.append(
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("__pid", "__plat", "__plon", "neighbor_id", "rank", "dist")
        )

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("__pid").alias(point_id), "neighbor_id", "rank", "dist"
    )

"""Tile assignment, per-cell histograms, salted repartition, adaptive
cell-splitting — the engine's skew-management layer.

Reference analogue: Overpass quadtile (`qt`) output ordering
(/root/reference/lib/osm_utils.py:46-48) and the 200-edit changeset cap
(lib/osm_utils.py:155-165) are the reference's only "partitioning"; the
engine makes partitioning explicit per BASELINE.json:north_star ("skew from
dense urban cells is handled explicitly with salted repartitioning and
adaptive cell-splitting").

Design notes for 100 TB scale:
* tile assignment is a pure column expression (WholeStageCodegen, no UDF,
  no shuffle) — it degenerates to a computed partition key (SURVEY.md §2.3
  "tile-assignment join").
* the histogram is one map-side-combined groupBy; its output (distinct
  cells) is tiny relative to the fact table and is safe to broadcast.
* salting multiplies only the HOT keys' partition count; cold keys keep
  salt 0, so the extra shuffle fan-out is bounded by n_hot * buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.cells import tile_key_col


def assign_tiles(
    df: DataFrame, res: int, lat: str = "lat", lon: str = "lon", out: str = "tile"
) -> DataFrame:
    """Add the flat tile key at resolution ``res`` (pure column expr)."""
    return df.withColumn(out, tile_key_col(F.col(lat), F.col(lon), res))


def cell_histogram(df: DataFrame, cell_col: str = "tile") -> DataFrame:
    """Per-cell row counts (map-side combine; output is the distinct-cell
    set — small, broadcastable)."""
    return df.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n_rows"))


def hot_cells(df: DataFrame, cell_col: str = "tile", threshold: int = 10_000) -> DataFrame:
    return cell_histogram(df, cell_col).filter(F.col("n_rows") > threshold)


def salted_repartition(
    df: DataFrame,
    cell_col: str = "tile",
    threshold: int = 10_000,
    buckets: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (cell, salt) where salt > 0 only for hot cells.

    One broadcast join against the hot-cell list + one shuffle; downstream
    per-tile work (applyInPandas transforms, snapshot writes) then sees
    bounded partition sizes even when one urban cell holds 20% of rows.
    """
    hot = hot_cells(df, cell_col, threshold).select(cell_col, F.lit(True).alias("__hot"))
    salted = (
        df.join(F.broadcast(hot), cell_col, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.abs(F.hash(*[F.col(c) for c in df.columns])), F.lit(buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    if num_partitions:
        return salted.repartition(num_partitions, cell_col, "salt")
    return salted.repartition(cell_col, "salt")


def adaptive_split(
    df: DataFrame,
    base_res: int,
    max_rows: int = 10_000,
    max_res: int = 20,
    lat: str = "lat",
    lon: str = "lon",
    out: str = "acell",
) -> DataFrame:
    """Adaptive cell-splitting: every row gets the coarsest tile (>=
    base_res) whose population is <= max_rows (dense cells recurse to
    children, SURVEY.md §4 item 3).

    Implemented as a driver loop of histogram -> broadcast-join -> refine;
    each iteration touches only rows still in oversized cells. Iterations
    are bounded by (max_res - base_res), independent of data size.
    """
    cur = df.withColumn(out, tile_key_col(F.col(lat), F.col(lon), base_res)).withColumn(
        "__res", F.lit(base_res)
    )
    settled = None
    res = base_res
    while res < max_res:
        hist = cur.groupBy(out).agg(F.count(F.lit(1)).alias("__n"))
        big = hist.filter(F.col("__n") > max_rows).select(out, F.lit(True).alias("__big"))
        if big.limit(1).count() == 0:
            break
        cur = cur.join(F.broadcast(big), out, "left")
        ok = cur.filter(F.col("__big").isNull()).drop("__big")
        settled = ok if settled is None else settled.unionByName(ok)
        res += 1
        cur = (
            cur.filter(F.col("__big").isNotNull())
            .drop("__big")
            .withColumn(out, tile_key_col(F.col(lat), F.col(lon), res))
            .withColumn("__res", F.lit(res))
        )
    result = cur if settled is None else settled.unionByName(cur)
    return result.withColumnRenamed("__res", f"{out}_res")

"""Point-in-polygon join: cell-prefilter equi-join + exact vectorized
ray-cast refinement.

Replaces the reference's server-side area containment
(/root/reference/lib/osm_utils.py:34-43 — ``area[...]->.searchArea``) with
the engine's central design move (SURVEY.md §2.3, §4 item 1):

1. cover every polygon with grid cells at resolution ``res``
   (distributed: one ``applyInPandas`` group per polygon);
2. equi-join points to cover cells — Catalyst picks broadcast vs
   sort-merge; AQE handles residual skew;
3. rows landing in *interior* cover cells are accepted without further
   work; rows in *boundary* cells get exact ray-cast refinement inside a
   ``mapInPandas`` batch kernel (NumPy, no per-row Python).

Scale notes: the cover table has O(polygons x cells-per-polygon) rows —
small next to the fact table; it broadcasts when under the threshold and
shuffles otherwise. Only boundary-cell rows (a thin band around each
polygon) pay the refinement cost, and the refinement itself is
O(points_in_batch x ring_vertices) vectorized.

Tie-break contract: ray-cast half-open edge rule (functions/geo.py), plus
``unique=True`` resolves multi-polygon membership (nested polygons) to the
lexicographically smallest polygon_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import geo
from ..functions.cells import tile_key_col


def _ring_to_np(ring) -> np.ndarray:
    """list<struct<lat,lon>> (as pandas objects) -> (M,2) float64 array."""
    return np.array([[p["lat"], p["lon"]] for p in ring], dtype=np.float64)


def polygon_cover(polygons: DataFrame, res: int) -> DataFrame:
    """(polygon_id, tile, full_inside) cover table at resolution ``res``.

    Distributed: one group per polygon; each group runs the NumPy cover
    kernel. Output tile uses the flat SQL-parity key (ix * 2^res + iy).
    """
    from ..functions.cells import cell_to_tile_key

    def per_polygon(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            ring = _ring_to_np(row["ring"])
            cells, full = geo.polygon_cell_cover(ring, res)
            out.append(
                pd.DataFrame(
                    {
                        "polygon_id": row["polygon_id"],
                        "tile": cell_to_tile_key(cells),
                        "full_inside": full,
                    }
                )
            )
        if not out:
            return pd.DataFrame({"polygon_id": pd.Series(dtype="object"),
                                 "tile": pd.Series(dtype="int64"),
                                 "full_inside": pd.Series(dtype="bool")})
        return pd.concat(out, ignore_index=True)

    return (
        polygons.select("polygon_id", "ring")
        .groupBy("polygon_id")
        .applyInPandas(per_polygon, schema="polygon_id string, tile long, full_inside boolean")
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 8,
    lat: str = "lat",
    lon: str = "lon",
    unique: bool = False,
    id_col: str = "image_id",
    broadcast_cover: bool = True,
    broadcast_rings: bool = True,
) -> DataFrame:
    """Join each point to every polygon containing it.

    Returns ``points`` columns + ``polygon_id``. ``unique=True`` keeps only
    the lexicographically smallest polygon_id per point (tile-ownership
    tie-break; requires unique ``id_col``).

    Scale switches: ``broadcast_cover=False`` shuffles the cover equi-join
    (huge polygon sets whose cover exceeds the broadcast threshold);
    ``broadcast_rings=False`` shuffles the boundary-row-to-ring join on
    polygon_id instead of broadcasting the ring dimension — rings of
    10^6 admin polygons don't fit an executor broadcast, but boundary rows
    hash-partition by polygon_id and meet their ring in the same task.
    Both paths feed the identical refine kernel.
    """
    pts = points.withColumn("__tile", tile_key_col(F.col(lat), F.col(lon), res))
    cover = polygon_cover(polygons, res).withColumnRenamed("tile", "__cover_tile")
    if broadcast_cover:
        cover = F.broadcast(cover)
    cand = pts.join(cover, pts["__tile"] == cover["__cover_tile"], "inner").drop(
        "__cover_tile"
    )

    interior = cand.filter(F.col("full_inside")).drop("full_inside", "__tile")

    rings = polygons.select("polygon_id", "ring")
    if broadcast_rings:
        rings = F.broadcast(rings)
    boundary = (
        cand.filter(~F.col("full_inside"))
        .drop("full_inside", "__tile")
        .join(rings, "polygon_id", "inner")
    )

    out_cols = points.columns + ["polygon_id"]

    def refine(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for pid, idx in pdf.groupby("polygon_id").groups.items():
                sub = pdf.loc[idx]
                ring = _ring_to_np(sub["ring"].iloc[0])
                inside = geo.points_in_polygon_chunked(
                    sub[lat].to_numpy(), sub[lon].to_numpy(), ring
                )
                keep[pdf.index.get_indexer(idx)] = inside
            yield pdf.loc[keep, out_cols]

    schema_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in points.schema.fields
    )
    refined = boundary.mapInPandas(refine, schema=f"{schema_fields}, polygon_id string")

    result = interior.select(*out_cols).unionByName(refined)
    if unique:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy("polygon_id")
        result = (
            result.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return result


def bbox_filter(
    df: DataFrame, south: float, west: float, north: float, east: float,
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """Reference bbox scan (/root/reference/lib/osm_utils.py:24-33) as a
    pushed-down range predicate."""
    return df.filter(
        (F.col(lat) >= south) & (F.col(lat) <= north) & (F.col(lon) >= west) & (F.col(lon) <= east)
    )

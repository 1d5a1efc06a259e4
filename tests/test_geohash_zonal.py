"""Geohash codec (canonical vectors, prefix law, Column/NumPy parity,
codegen-only plan) and raster zonal statistics vs a brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.functions import cells, geo
from langtoolsosm_spark.functions import geohash as gh
from langtoolsosm_spark.operators import spatial

RNG = np.random.default_rng(1723)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- NumPy codec ----------------------------------------------------------

def test_canonical_vectors():
    # published geohash test vectors
    assert gh.geohash_encode([57.64911], [10.40744], 11)[0] == "u4pruydqqvj"
    assert gh.geohash_encode([42.6], [-5.6], 5)[0] == "ezs42"
    assert gh.geohash_encode([0.0], [0.0], 1)[0] == "s"


def test_roundtrip_bbox_contains_point():
    lat = RNG.uniform(-90, 90, 500)
    lon = RNG.uniform(-180, 180, 500)
    enc = gh.geohash_encode(lat, lon, 8)
    s, n, w, e = gh.geohash_decode(enc)
    assert ((lat >= s) & (lat < n) & (lon >= w) & (lon < e)).all()
    # re-encoding the cell center reproduces the code exactly
    assert (gh.geohash_encode((s + n) / 2, (w + e) / 2, 8) == enc).all()


def test_prefix_law():
    """substr(geohash_p7, 1, k) IS the precision-k geohash — the property
    geohash_rollup's no-re-encode coarse rollup rests on. Exact because
    floor(floor(x * 2^a) / 2^(a-b)) == floor(x * 2^b) for a >= b."""
    lat = RNG.uniform(-90, 90, 1000)
    lon = RNG.uniform(-180, 180, 1000)
    full = gh.geohash_encode(lat, lon, 7)
    for k in (1, 2, 4, 6):
        short = gh.geohash_encode(lat, lon, k)
        assert (np.char.ljust(full.astype(f"U{k}"), k) == short).all()


def test_decode_rejects_bad_chars():
    with pytest.raises(ValueError):
        gh.geohash_decode(["ab1l"])  # 'l' is not in the alphabet


# --- Spark column twin ----------------------------------------------------

def test_column_parity_and_plan(spark):
    pdf = pd.DataFrame(
        {
            "id": np.arange(400, dtype=np.int64),
            "lat": RNG.uniform(-90, 90, 400),
            "lon": RNG.uniform(-180, 180, 400),
        }
    )
    df = spark.createDataFrame(pdf)
    out = df.select(
        "id", gh.geohash_col(F.col("lat"), F.col("lon"), 7).alias("g")
    )
    plan = _plan(out)
    # pure codegen: no Python eval, no exchange — the scan is the plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    got = out.toPandas().sort_values("id").g.to_numpy()
    ref = gh.geohash_encode(pdf.lat.to_numpy(), pdf.lon.to_numpy(), 7)
    assert (got == ref).all()


# --- zonal stats ----------------------------------------------------------

ZONES = [
    ("Z1", [(36.0, -3.0), (36.0, 1.0), (39.0, 1.0), (39.0, -3.0)]),
    ("Z2", [(39.5, 1.0), (39.5, 4.0), (42.0, 4.0), (42.0, 1.0)]),
    ("Z3", [(10.0, 50.0), (10.0, 62.0), (18.0, 62.0), (18.0, 50.0)]),  # point-free
]
RES = 6


@pytest.fixture(scope="module")
def zonal_inputs(spark):
    lat = 35.0 + RNG.uniform(0, 10, 600)
    lon = -5.0 + RNG.uniform(0, 15, 600)
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(600, dtype=np.int64), "lat": lat, "lon": lon})
    )
    polys = spark.createDataFrame(
        [(pid, [{"lat": a, "lon": o} for a, o in ring]) for pid, ring in ZONES],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    return pts, polys, lat, lon


def _brute_zonal(lat, lon, res):
    """Brute-force oracle: every tile center at res against every ring."""
    n = 1 << res
    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ix, iy = ix.ravel(), iy.ravel()
    clat = (iy + 0.5) / n * 180.0 - 90.0
    clon = (ix + 0.5) / n * 360.0 - 180.0
    tiles = ix * n + iy
    pt_tiles = cells.tile_key(lat, lon, res)
    hist = pd.Series(pt_tiles).value_counts()
    rows = {}
    for pid, ring in ZONES:
        ring_np = np.array(ring, dtype=np.float64)
        inside = geo.points_in_polygon(clat, clon, ring_np)
        zone = tiles[inside]
        counts = hist.reindex(zone).dropna()
        if len(zone) == 0:
            continue  # a zone with no raster footprint has no stats row
        rows[pid] = (
            len(zone),
            len(counts),
            int(counts.sum()),
            int(counts.max()) if len(counts) else 0,
        )
    return rows


def test_zonal_stats_matches_brute_force(spark, zonal_inputs):
    pts, polys, lat, lon = zonal_inputs
    got = {
        r["polygon_id"]: (r["n_tiles"], r["n_occupied"], r["n_points"], r["max_tile_n"])
        for r in spatial.zonal_stats(pts, polys, res=RES).collect()
    }
    assert got == _brute_zonal(lat, lon, RES)
    # the empty zone is present with zeroed stats, not dropped
    assert got["Z3"][1:] == (0, 0, 0) and got["Z3"][0] > 0


def test_zonal_stats_broadcast_gate(spark, zonal_inputs):
    """Below the counted threshold the tile join broadcasts the zone
    raster; with the gate disabled the path still produces identical
    rows (AQE may or may not re-broadcast — that's its call, so only the
    gated plan's shape is asserted)."""
    pts, polys, _, _ = zonal_inputs
    fast = spatial.zonal_stats(pts, polys, res=RES)
    assert "BroadcastHashJoin" in _plan(fast)
    forced = spatial.zonal_stats(pts, polys, res=RES, broadcast_threshold=0)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(fast) == key(forced)


# --- snap_to_segments -----------------------------------------------------

def _brute_snap(plat, plon, segs, radius):
    """Exhaustive NumPy point-to-segment arg-min (independent formula:
    np.clip + einsum rather than the engine's expression tree)."""
    a = segs[:, [2, 1]]  # (lon1, lat1)
    b = segs[:, [4, 3]]  # (lon2, lat2)
    ab = b - a
    len2 = (ab ** 2).sum(1)
    out = {}
    for pid, y, x in zip(range(len(plat)), plat, plon):
        ap = np.array([x, y]) - a
        t = np.clip(
            np.divide((ap * ab).sum(1), len2, out=np.zeros_like(len2),
                      where=len2 > 0),
            0.0, 1.0,
        )
        d2 = ((ap - t[:, None] * ab) ** 2).sum(1)
        ok = d2 <= radius * radius
        if not ok.any():
            continue
        qd = np.floor(d2 * 1e9).astype(np.int64)
        order = np.lexsort((segs[:, 0], np.where(ok, qd, np.iinfo(np.int64).max)))
        win = order[0]
        out[pid] = (int(segs[win, 0]), float(t[win]), float(d2[win]))
    return out


def test_snap_to_segments_matches_brute_force(spark):
    n_pts, n_segs, radius = 300, 200, 0.3
    plat = RNG.uniform(35, 45, n_pts)
    plon = RNG.uniform(-5, 10, n_pts)
    s_lat = RNG.uniform(35, 45, n_segs)
    s_lon = RNG.uniform(-5, 10, n_segs)
    segs = np.column_stack(
        [
            np.arange(n_segs, dtype=np.float64),
            s_lat,
            s_lon,
            s_lat + RNG.uniform(-0.2, 0.2, n_segs),
            s_lon + RNG.uniform(-0.2, 0.2, n_segs),
        ]
    )
    pts_df = spark.createDataFrame(
        pd.DataFrame({"point_id": np.arange(n_pts, dtype=np.int64),
                      "lat": plat, "lon": plon})
    )
    segs_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "seg_id": segs[:, 0].astype(np.int64),
                "lat1": segs[:, 1], "lon1": segs[:, 2],
                "lat2": segs[:, 3], "lon2": segs[:, 4],
            }
        )
    )
    got = {
        r["point_id"]: (r["seg_id"], r["t"], r["dist"])
        for r in spatial.snap_to_segments(pts_df, segs_df, radius).collect()
    }
    ref = _brute_snap(plat, plon, segs, radius)
    assert set(got) == set(ref)
    for pid, (sid, t, d2) in ref.items():
        gsid, gt, gd2 = got[pid]
        assert gsid == sid
        assert gt == pytest.approx(t, abs=1e-12)
        assert gd2 == pytest.approx(d2, abs=1e-12)


def test_snap_plan_is_jvm_side(spark):
    pts_df = spark.createDataFrame(
        pd.DataFrame({"point_id": [0], "lat": [40.0], "lon": [1.0]})
    )
    segs_df = spark.createDataFrame(
        pd.DataFrame({"seg_id": [0], "lat1": [40.0], "lon1": [0.9],
                      "lat2": [40.1], "lon2": [1.1]})
    )
    df = spatial.snap_to_segments(pts_df, segs_df, 0.2)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # counted gate fires at this size

"""Property tests for the cell index kernels (SURVEY.md §5 item 3)."""

import numpy as np

from langtoolsosm_spark.functions import cells


RNG = np.random.default_rng(42)
LAT = RNG.uniform(-89.9, 89.9, 5000)
LON = RNG.uniform(-179.9, 179.9, 5000)


def test_encode_decode_roundtrip():
    for res in (0, 1, 5, 12, 26):
        cid = cells.cell_encode(LAT, LON, res)
        r, ix, iy = cells.cell_decode(cid)
        assert (r == res).all()
        n = 1 << res
        assert (ix >= 0).all() and (ix < n).all()
        assert (iy >= 0).all() and (iy < n).all()
        # re-encoding the cell center gives the same cell
        clat, clon = cells.cell_center(cid)
        assert (cells.cell_encode(clat, clon, res) == cid).all()


def test_point_in_exactly_one_cell_per_res():
    for res in (3, 8):
        cid = cells.cell_encode(LAT, LON, res)
        s, w, n, e = cells.cell_bounds(cid)
        assert ((LAT >= s) & (LAT < n)).all()
        assert ((LON >= w) & (LON < e)).all()


def test_parent_child_cover():
    cid = cells.cell_encode(LAT, LON, 10)
    par = cells.cell_parent(cid)
    # the parent of each point's res-10 cell == the point's res-9 cell
    assert (par == cells.cell_encode(LAT, LON, 9)).all()
    # children of a cell all have it as parent
    kids = cells.cell_children(int(cid[0]))
    assert len(kids) == 4
    assert (cells.cell_parent(kids) == cid[0]).all()


def test_tile_key_matches_sql_formula():
    res = 8
    n = 1 << res
    tk = cells.tile_key(LAT, LON, res)
    ix = np.clip(np.floor((LON + 180.0) / 360.0 * n), 0, n - 1)
    iy = np.clip(np.floor((LAT + 90.0) / 180.0 * n), 0, n - 1)
    assert (tk == (ix * n + iy).astype(np.int64)).all()


def test_ring_sizes_and_distance():
    cid = cells.cell_encode(np.array([40.0]), np.array([2.0]), 10)
    r0 = cells.cell_ring(cid, 0)
    assert r0.shape == (1, 1) and r0[0, 0] == cid[0]
    for k in (1, 2, 3):
        ring = cells.cell_ring(cid, k)[0]
        ring = ring[ring >= 0]
        assert len(ring) == 8 * k
        _, ix0, iy0 = cells.cell_decode(cid)
        _, ix, iy = cells.cell_decode(ring)
        cheb = np.maximum(np.abs(ix - ix0[0]), np.abs(iy - iy0[0]))
        assert (cheb == k).all()


def test_disk():
    cid = cells.cell_encode(np.array([40.0]), np.array([2.0]), 10)[0]
    disk = cells.cell_disk(int(cid), 2)
    assert len(disk) == 25
    assert len(np.unique(disk)) == 25


def test_morton_locality():
    # morton of adjacent cells differs in low bits; key is monotone in blocks
    ix = np.array([0, 1, 2, 3], dtype=np.int64)
    iy = np.array([0, 0, 0, 0], dtype=np.int64)
    z = cells.morton_interleave(ix, iy)
    assert list(z) == [0, 1, 4, 5]
    z2 = cells.morton_interleave(iy, ix)
    assert list(z2) == [0, 2, 8, 10]
    # roundtrip-free sanity: distinct inputs -> distinct keys
    z3 = cells.morton_key(LAT, LON, 26)
    assert len(np.unique(z3)) > 4900


def test_quadkey_prefix_and_digits(spark):
    """A res-8 quadkey starts with the res-4 quadkey of the same point
    (ancestor containment = prefix match), digits are base-4, and the
    key length equals res."""
    import pandas as pd
    from pyspark.sql import functions as F

    from langtoolsosm_spark.functions.cells import quadkey_col

    df = spark.createDataFrame(
        pd.DataFrame({"lat": [40.4, -33.9, 0.0], "lon": [2.2, 151.2, 0.0]})
    )
    out = df.select(
        quadkey_col(F.col("lat"), F.col("lon"), 8).alias("q8"),
        quadkey_col(F.col("lat"), F.col("lon"), 4).alias("q4"),
    ).collect()
    for r in out:
        assert len(r["q8"]) == 8 and len(r["q4"]) == 4
        assert r["q8"].startswith(r["q4"])
        assert set(r["q8"]) <= set("0123")

"""Round-6 operators: spatially disjoint splits, per-cell cap balancing,
k-ring smoothing, Geary's C."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _pts(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": np.arange(n, dtype=np.int64),
                "lat": rng.uniform(35.0, 45.0, n),
                "lon": rng.uniform(-5.0, 10.0, n),
            }
        )
    )


def test_geo_split_is_spatially_disjoint(spark):
    """All rows sharing a tile must share a split — the whole point of
    hashing the cell instead of the row id."""
    from langtoolsosm_spark.operators.sampling import geo_split

    out = geo_split(_pts(spark), res=6).select("tile", "split").distinct()
    per_tile = out.groupBy("tile").count().filter(F.col("count") > 1).count()
    assert per_tile == 0


def test_geo_split_sticky_and_parallelism_invariant(spark):
    from langtoolsosm_spark.operators.sampling import geo_split

    base = _pts(spark)
    a = geo_split(base, res=6).orderBy("point_id").collect()
    b = geo_split(base.repartition(13), res=6).orderBy("point_id").collect()
    assert a == b
    # growing the table never moves an old row's split
    grown = geo_split(base.unionByName(_pts(spark, n=100, seed=99).withColumn(
        "point_id", F.col("point_id") + 10_000)), res=6)
    old = {r["point_id"]: r["split"] for r in grown.filter(F.col("point_id") < 10_000).collect()}
    assert old == {r["point_id"]: r["split"] for r in a}


def test_tile_cap_sample_matches_plain_window_spec(spark):
    """The histogram prefilter + counted fallback must be semantically
    invisible: result == the cap smallest (h32, id) per tile."""
    from pyspark.sql import Window

    from langtoolsosm_spark.operators.sampling import _hash32, tile_cap_sample
    from langtoolsosm_spark.operators.tiling import assign_tiles

    pts = _pts(spark, n=600)
    got = (
        tile_cap_sample(pts, res=5, cap=3, id_col="point_id")
        .orderBy("tile", "rk")
        .collect()
    )
    w = Window.partitionBy("tile").orderBy("__h", "id")
    want = (
        assign_tiles(pts, 5)
        .select(F.col("point_id").alias("id"), "tile")
        .withColumn("__h", _hash32(F.col("id"), "cap0"))
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("id", "tile", "rk")
        .orderBy("tile", "rk")
        .collect()
    )
    assert got == want
    assert all(r["rk"] <= 3 for r in got)


def test_tile_cap_sample_fallback_path_is_exact(spark):
    """margin=0 makes the prefilter drop EVERY row, forcing the counted
    fallback for every tile — the result must still be exact."""
    from langtoolsosm_spark.operators.sampling import tile_cap_sample

    pts = _pts(spark, n=300)
    fast = tile_cap_sample(pts, res=5, cap=2, id_col="point_id")
    slow = tile_cap_sample(pts, res=5, cap=2, id_col="point_id", margin=0)
    assert fast.orderBy("tile", "rk").collect() == slow.orderBy("tile", "rk").collect()


def test_tile_cap_sample_rejects_bad_cap(spark):
    from langtoolsosm_spark.operators.sampling import tile_cap_sample

    with pytest.raises(ValueError):
        tile_cap_sample(_pts(spark), res=5, cap=0, id_col="point_id")


def test_kring_smooth_matches_bruteforce(spark):
    from langtoolsosm_spark.operators.tiling import kring_smooth

    res, k = 4, 1
    n = 1 << res
    pts = _pts(spark, n=200)
    got = {r["tile"]: r["ring_sum"] for r in kring_smooth(pts, res=res, k=k).collect()}

    pdf = pts.toPandas()
    ix = np.clip(np.floor((pdf.lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((pdf.lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    want = {}
    for tx in range(n):
        for ty in range(n):
            s = grid[max(0, tx - k):tx + k + 1, max(0, ty - k):ty + k + 1].sum()
            if s > 0:
                want[tx * n + ty] = s
    assert got == want


def test_kring_smooth_rejects_bad_k(spark):
    from langtoolsosm_spark.operators.tiling import kring_smooth

    with pytest.raises(ValueError):
        kring_smooth(_pts(spark), res=4, k=0)


def test_gearys_c_matches_dense_formula(spark):
    """Histogram-only closed form == the textbook dense computation over
    the full n x n grid (empties as 0) at a res small enough to
    materialize."""
    from langtoolsosm_spark.operators.spatial import gearys_c

    res = 3
    n = 1 << res
    pts = _pts(spark, n=150)
    row = gearys_c(pts, res=res).collect()[0]

    pdf = pts.toPandas()
    ix = np.clip(np.floor((pdf.lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((pdf.lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.float64)
    np.add.at(grid, (ix, iy), 1.0)
    N = n * n
    W = 4 * n * (n - 1)
    num = 0.0
    for x in range(n):
        for y in range(n):
            for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                if 0 <= x + dx < n and 0 <= y + dy < n:
                    num += (grid[x, y] - grid[x + dx, y + dy]) ** 2
    xbar = grid.sum() / N
    den = ((grid - xbar) ** 2).sum()
    want = (N - 1) * num / (2 * W * den)
    assert row["res"] == res and row["n_cells"] == N and row["w_sum"] == W
    assert row["geary_c"] == pytest.approx(want, rel=1e-12)
    assert row["occupied"] == int((grid > 0).sum())


def test_gearys_c_uniform_vs_checkerboard_ordering(spark):
    """Sanity on the statistic's direction: a single tight cluster
    (clustered density) must score below a maximally alternating
    pattern (dispersed)."""
    from langtoolsosm_spark.operators.spatial import gearys_c

    res = 3
    n = 1 << res
    # clustered: everything in one cell
    clustered = spark.createDataFrame(
        pd.DataFrame({"point_id": range(64), "lat": [36.1] * 64, "lon": [1.1] * 64})
    )
    # dispersed: checkerboard of the index grid (one point per black cell)
    rows = []
    for x in range(n):
        for y in range(n):
            if (x + y) % 2 == 0:
                rows.append(
                    (
                        len(rows),
                        -90.0 + (y + 0.5) * 180.0 / n,
                        -180.0 + (x + 0.5) * 360.0 / n,
                    )
                )
    board = spark.createDataFrame(pd.DataFrame(rows, columns=["point_id", "lat", "lon"]))
    c_clustered = gearys_c(clustered, res=res).collect()[0]["geary_c"]
    c_board = gearys_c(board, res=res).collect()[0]["geary_c"]
    assert c_clustered < c_board


def test_region_lang_audit_flags_and_coverage(spark):
    """Known captions in known regions: agree mirrors the marker guess vs
    the region dim; points outside every polygon are excluded."""
    from langtoolsosm_spark.operators.translate import region_lang_audit

    polys = spark.createDataFrame(
        [("G1", [{"lat": 36.0, "lon": -3.0}, {"lat": 36.0, "lon": 1.0},
                 {"lat": 39.0, "lon": 1.0}, {"lat": 39.0, "lon": -3.0}])],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    langs = spark.createDataFrame(
        [("G1", "en")], "polygon_id string, expected_lang string"
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": [1, 2, 3],
                "lat": [37.0, 37.5, 50.0],     # 3 is outside
                "lon": [0.0, 0.5, 0.0],
                "text": ["see the map a lot", "mira el mapa el dia", "x"],
            }
        )
    )
    rows = {r["point_id"]: r for r in region_lang_audit(pts, polys, langs, res=6).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["guess"] == "en" and rows[1]["agree"] == 1
    assert rows[2]["guess"] == "es" and rows[2]["agree"] == 0


def test_decayed_tiles_weight_math(spark):
    """Power-of-two decay: fresh event = 2^16, one halflife = 2^15,
    beyond max_halvings floors at 1, future events clamp to age 0."""
    from langtoolsosm_spark.operators.heatmap import decayed_tiles

    anchor = 1_000_000
    h = 100
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [anchor, anchor - h, anchor - 17 * h, anchor + 50], unit="s"
                ),
                "lat": [40.0] * 4,
                "lon": [0.0] * 4,
            }
        )
    )
    row = decayed_tiles(
        df, res=4, anchor_epoch=anchor, halflife_s=h, max_halvings=16
    ).collect()
    assert len(row) == 1
    r = row[0]
    # 2^16 (fresh) + 2^15 (one halflife) + 2^0 (capped) + 2^16 (future->0)
    assert r["decayed_sum"] == 65536 + 32768 + 1 + 65536
    assert r["n_points"] == 4 and r["newest_age_s"] == 0


def test_decayed_tiles_rejects_bad_params(spark):
    from langtoolsosm_spark.operators.heatmap import decayed_tiles

    df = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime([0], unit="s"), "lat": [0.0], "lon": [0.0]})
    )
    with pytest.raises(ValueError):
        decayed_tiles(df, res=4, anchor_epoch=0, halflife_s=0)
    with pytest.raises(ValueError):
        decayed_tiles(df, res=4, anchor_epoch=0, halflife_s=10, max_halvings=63)


def test_mip_pyramid_matches_numpy_reduce(spark):
    """Exact 2x2 floor-mean chain on a known 5x6 image: level dims halve
    with odd row/col cropped; checksums match the hand reduce."""
    from langtoolsosm_spark.functions import imagecodec as ic
    from langtoolsosm_spark.operators.images import mip_pyramid

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)  # h=5, w=6
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "bytes": [ic.encode(px, "raw")],
                      "fmt": ["raw"]})
    )
    got = {r["level"]: r for r in mip_pyramid(df, levels=2).collect()}

    cur = px.astype(np.int64)
    want = {}
    for lvl in range(3):
        h, w = cur.shape[:2]
        wts = 3 * (np.arange(h)[:, None] * w + np.arange(w))[..., None] + np.arange(3) + 1
        want[lvl] = (w, h, int(cur.sum()), int((cur * wts).sum()))
        he, we = (h // 2) * 2, (w // 2) * 2
        q = cur[:he, :we]
        cur = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) // 4
    assert set(got) == {0, 1, 2}
    for lvl, (w, h, s, chk) in want.items():
        r = got[lvl]
        assert (r["w"], r["h"], r["px_sum"], r["chk"]) == (w, h, s, chk)
    # dims: 6x5 -> 3x2 -> 1x1
    assert (got[1]["w"], got[1]["h"]) == (3, 2)
    assert (got[2]["w"], got[2]["h"]) == (1, 1)


def test_mip_pyramid_stops_before_zero_dim(spark):
    from langtoolsosm_spark.functions import imagecodec as ic
    from langtoolsosm_spark.operators.images import mip_pyramid

    px = np.full((1, 7, 3), 9, dtype=np.uint8)  # 1-px tall: no level 1
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "bytes": [ic.encode(px, "raw")],
                      "fmt": ["raw"]})
    )
    rows = mip_pyramid(df, levels=3).collect()
    assert [r["level"] for r in rows] == [0]


def test_mosaic_pack_checksum_equals_composited_canvas(spark):
    """The separable per-quadrant partials must equal the checksum of the
    ACTUALLY composited 2*side canvas, and incomplete groups drop."""
    from langtoolsosm_spark.functions import imagecodec as ic
    from langtoolsosm_spark.operators.images import mosaic_pack
    from langtoolsosm_spark.operators.sampling import _hash32

    rng = np.random.default_rng(11)
    n, side = 9, 4  # one bucket -> groups of 4, one incomplete (9 % 4 = 1)
    imgs = [rng.integers(0, 256, (rng.integers(4, 9), rng.integers(4, 9), 3),
                         dtype=np.uint8) for _ in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"m{i}" for i in range(n)],
                "bytes": [ic.encode(p, "raw") for p in imgs],
                "fmt": ["raw"] * n,
            }
        )
    )
    got = {r["group_id"]: r for r in
           mosaic_pack(df, side=side, n_buckets=1).collect()}
    assert len(got) == 2  # 9 images -> 2 complete groups, tail dropped

    # replay assignment on the driver
    h = {r["image_id"]: r["h"] for r in df.select(
        "image_id", _hash32(F.col("image_id"), "mosaic0").alias("h")).collect()}
    order = sorted(range(n), key=lambda i: (h[f"m{i}"], f"m{i}"))
    canvas = 2 * side
    rr = np.arange(side)
    for g in range(2):
        comp = np.zeros((canvas, canvas, 3), dtype=np.int64)
        for quad in range(4):
            px = imgs[order[g * 4 + quad]].astype(np.int64)
            ih, iw = px.shape[:2]
            rs = px[(rr * ih) // side][:, (rr * iw) // side]
            dr, dc = side * (quad // 2), side * (quad % 2)
            comp[dr:dr + side, dc:dc + side] = rs
        wts = (3 * (np.arange(canvas)[:, None] * canvas
                    + np.arange(canvas))[..., None] + np.arange(3) + 1)
        want_chk = int((comp * wts).sum())
        gid = [k for k in got if k % (1 << 32) == g]
        assert len(gid) == 1
        assert got[gid[0]]["chk"] == want_chk
        assert got[gid[0]]["px_sum"] == int(comp.sum())


def test_convex_hull_edges_properties(spark):
    """Every returned edge keeps all cluster points on its left (or
    collinear-between); edges form a single closed CCW ring; degenerate
    clusters behave per contract."""
    from langtoolsosm_spark.operators.spatial import convex_hull_edges

    rng = np.random.default_rng(5)
    n = 120
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "cluster_id": np.int64(0),
            "lat": rng.uniform(35, 45, n),
            "lon": rng.uniform(-5, 10, n),
        }
    )
    # degenerate clusters: single point, two points, collinear run, duplicate
    extra = pd.DataFrame(
        {
            "point_id": np.arange(n, n + 8, dtype=np.int64),
            "cluster_id": np.int64([1, 2, 2, 3, 3, 3, 4, 4]),
            "lat": [40.0, 40.0, 41.0, 40.0, 40.5, 41.0, 40.0, 40.0],
            "lon": [0.0, 0.0, 1.0, 0.0, 0.5, 1.0, 2.0, 2.0],
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    edges = convex_hull_edges(df).collect()
    by_cluster = {}
    for r in edges:
        by_cluster.setdefault(r["cluster"], []).append((r["a_id"], r["b_id"]))

    # cluster 1 (single point): no edges; cluster 2 (two points) and
    # cluster 3 (collinear): exactly the two directed extreme edges;
    # cluster 4 (duplicates of one location): no edges
    assert 1 not in by_cluster and 4 not in by_cluster
    assert sorted(by_cluster[2]) == [(n + 1, n + 2), (n + 2, n + 1)]
    assert sorted(by_cluster[3]) == [(n + 3, n + 5), (n + 5, n + 3)]

    # cluster 0: ring closes, and all points sit left-of every edge
    ring = dict(by_cluster[0])
    assert len(ring) == len(by_cluster[0])  # each vertex has one successor
    start = next(iter(ring))
    seen, cur = [start], ring[start]
    while cur != start:
        seen.append(cur)
        cur = ring[cur]
    assert len(seen) == len(ring)  # single closed cycle
    x = np.floor((pdf.lon + 180.0) * 1e6).astype(np.int64).values
    y = np.floor((pdf.lat + 90.0) * 1e6).astype(np.int64).values
    for a, b in by_cluster[0]:
        crossv = (x[b] - x[a]) * (y - y[a]) - (y[b] - y[a]) * (x - x[a])
        assert (crossv >= 0).all()  # nothing strictly right
    # hull vertices are a superset-free minimal set: interior point check
    hull_ids = set(ring)
    assert 0 < len(hull_ids) < n


def test_aspect_buckets_snap_and_batches(spark):
    """Nearest-rung snap with smaller-rung tie-break and ceil batch
    counts; metadata only (no bytes column needed)."""
    from langtoolsosm_spark.operators.images import aspect_buckets

    # ratios: 500 (1:2), 1000 (1:1), 875 -> tie 750 vs 1000 (both 125
    # away) -> smaller rung 750, 3000 -> clamps to nearest 2000
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "w": [10, 10, 7, 30] * 33,  # 132 rows -> batches of 32
                "h": [20, 10, 8, 10] * 33,
            }
        )
    )
    rows = {r["bucket_milli"]: r for r in aspect_buckets(df).collect()}
    assert set(rows) == {500, 750, 1000, 2000}
    assert rows[750]["min_ratio_milli"] == 875
    assert all(r["n_images"] == 33 and r["n_batches"] == 2 for r in rows.values())

    with pytest.raises(ValueError):
        aspect_buckets(df, batch_size=0)
    with pytest.raises(ValueError):
        aspect_buckets(df, ladder=(1000, 500))


def test_marching_cases_matches_bruteforce(spark):
    """Case histogram == dense numpy marching-squares classification of
    the full thresholded grid (case 0 excluded)."""
    from langtoolsosm_spark.operators.spatial import marching_cases

    res, thr = 4, 2
    n = 1 << res
    pts = _pts(spark, n=500, seed=13)
    got = {r["case_idx"]: r["n_blocks"]
           for r in marching_cases(pts, res=res, threshold=thr).collect()}

    pdf = pts.toPandas()
    ix = np.clip(np.floor((pdf.lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((pdf.lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    occ = grid >= thr
    case = (
        occ[:-1, :-1] * 1 + occ[1:, :-1] * 2 + occ[:-1, 1:] * 4 + occ[1:, 1:] * 8
    )
    want = {int(c): int((case == c).sum()) for c in np.unique(case) if c != 0}
    assert got == want
    assert 0 not in got

    with pytest.raises(ValueError):
        marching_cases(pts, res=res, threshold=0)


def test_sq8_codes_bounded_and_reconstruction_error(spark):
    from langtoolsosm_spark.operators.similarity import sq8_encode

    rng = np.random.default_rng(17)
    n, dim = 200, 16
    emb = rng.normal(0, 1, (n, dim))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": [v.tolist() for v in emb]})
    )
    codes = sq8_encode(df).toPandas()
    assert len(codes) == n * dim
    assert codes["code"].between(0, 255).all()
    # reconstruction: |dequant - xq| <= ceil(span/255) per dim
    xq = np.round(emb * 1000).astype(np.int64)
    mn, mx = xq.min(axis=0), xq.max(axis=0)
    span = np.maximum(mx - mn, 1)
    c = codes.pivot(index="vec_id", columns="d", values="code").values
    dq = mn + (c * span) // 255
    assert (np.abs(dq - xq) <= span // 255 + 1).all()


def test_sq8_ann_recall_vs_exact(spark):
    """Byte-compressed ANN must stay close to exact L2 on separable
    clustered vectors: recall@5 >= 0.8."""
    from langtoolsosm_spark.operators.similarity import sq8_ann_topk

    rng = np.random.default_rng(23)
    n, dim = 300, 16
    centers = rng.normal(0, 5, (6, dim))
    emb = centers[np.arange(n) % 6] + rng.normal(0, 0.5, (n, dim))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": [v.tolist() for v in emb]})
    )
    got = sq8_ann_topk(df, k=5).toPandas()
    xq = np.round(emb * 1000).astype(np.int64)
    hits = tot = 0
    for qid in range(0, n, 50):
        d2 = ((xq - xq[qid]) ** 2).sum(axis=1)
        d2[qid] = np.iinfo(np.int64).max
        exact = set(np.argsort(d2, kind="stable")[:5])
        approx = set(got[got.query_id == qid]["neighbor_id"])
        hits += len(exact & approx)
        tot += 5
    assert hits / tot >= 0.8


def test_simplify_radial_matches_sequential_walk(spark):
    """Kernel output == the obvious python walk; first point always
    kept; eps=1 keeps every distinct-location point."""
    from langtoolsosm_spark.operators.spatial import simplify_radial

    rng = np.random.default_rng(29)
    n = 300
    pdf = pd.DataFrame(
        {
            "user_id": np.int64(np.arange(n) % 5),
            "ts": np.int64(np.arange(n)),
            "event_id": np.int64(np.arange(n)),
            "lat": rng.uniform(35, 45, n),
            "lon": rng.uniform(-5, 10, n),
        }
    )
    eps = 2_000_000
    df = spark.createDataFrame(pdf)
    got = {(r["entity"], r["rn"]) for r in simplify_radial(df, eps).collect()}

    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    pdf["x"] = np.floor((pdf.lon + 180.0) * 1e6).astype(np.int64)
    pdf["y"] = np.floor((pdf.lat + 90.0) * 1e6).astype(np.int64)
    want = set()
    for uid, g in pdf.groupby("user_id"):
        kx = ky = None
        for rn, (x, y) in enumerate(zip(g.x, g.y), start=1):
            if kx is None or (x - kx) ** 2 + (y - ky) ** 2 >= eps * eps:
                want.add((uid, rn))
                kx, ky = x, y
    assert got == want
    # every entity keeps its first point
    assert all((u, 1) in got for u in range(5))

    with pytest.raises(ValueError):
        simplify_radial(df, 0)


def test_st_cube_grouping_sets(spark):
    """CUBE emits all 8 grouping sets; the grand total row equals the
    input count and detail rows sum to it at every level."""
    from langtoolsosm_spark.operators.tiling import st_cube

    n = 200
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(np.arange(n) * 5000, unit="s"),
                "lat": np.linspace(35, 44, n),
                "lon": np.linspace(-4, 9, n),
            }
        )
    )
    rows = st_cube(df, res=4).collect()
    total = [r for r in rows if r["tile"] is None and r["dow"] is None
             and r["hour"] is None]
    assert len(total) == 1 and total[0]["n"] == n
    by_dow = sum(r["n"] for r in rows
                 if r["tile"] is None and r["dow"] is not None and r["hour"] is None)
    assert by_dow == n
    # dow is the arithmetic (days + 4) % 7 convention: epoch 0 = Thursday(4)
    first = [r for r in rows if r["tile"] is None and r["hour"] is None
             and r["dow"] is not None]
    assert all(0 <= r["dow"] <= 6 for r in first)


def test_getis_gi_hotspot_ranks_hot_cell_first(spark):
    """The dense cell must carry the largest positive gi2; statistics
    match a dense numpy computation."""
    from langtoolsosm_spark.operators.spatial import getis_gi

    res, k = 4, 1
    n = 1 << res
    base = _pts(spark, n=300, seed=31)
    hot = spark.createDataFrame(
        pd.DataFrame({"point_id": range(1000, 1200),
                      "lat": [41.4] * 200, "lon": [2.1] * 200})
    )
    pts = base.unionByName(hot)
    rows = getis_gi(pts, res=res, k=k).collect()

    pdf = pts.toPandas()
    ix = np.clip(np.floor((pdf.lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((pdf.lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    N = n * n
    S, Q = int(grid.sum()), int((grid.astype(object) ** 2).sum())
    hot_tile = int(np.floor((2.1 + 180) / 360 * n)) * n + int(
        np.floor((41.4 + 90) / 180 * n))
    got = {r["tile"]: r for r in rows}
    # every cell whose k-ring contains the spike ties at ~the same a, so
    # the argmax is only guaranteed to be within Chebyshev-k of the spike
    top = max(rows, key=lambda r: r["gi2"] * r["hot"])
    assert top["hot"] == 1
    assert max(abs(top["tile"] // n - hot_tile // n),
               abs(top["tile"] % n - hot_tile % n)) <= k
    # spot-check one cell's closed form
    r = got[hot_tile]
    tx, ty = hot_tile // n, hot_tile % n
    ring = int(grid[max(0, tx - k):tx + k + 1, max(0, ty - k):ty + k + 1].sum())
    n_ring = (min(tx + k, n - 1) - max(tx - k, 0) + 1) * (
        min(ty + k, n - 1) - max(ty - k, 0) + 1)
    a = N * ring - n_ring * S
    want = (float(a) * float(a) * float(N - 1)) / (
        float(N * Q - S * S) * float(n_ring) * (float(N) - float(n_ring)))
    assert r["ring_sum"] == ring and r["n_ring"] == n_ring
    assert r["gi2"] == pytest.approx(want, rel=1e-12)


def test_zone_concurrency_sweep_line(spark):
    """Hand-checkable intervals: overlap counting, half-open semantics
    (exit at t frees before an enter at t), open-visit horizon."""
    from langtoolsosm_spark.operators.spatial import zone_concurrency

    visits = spark.createDataFrame(
        pd.DataFrame(
            {
                "zone": ["A", "A", "A", "B"],
                "enter_ts": pd.to_datetime([0, 50, 100, 10], unit="s"),
                "exit_ts": pd.to_datetime([100, 150, None, None], unit="s"),
            }
        )
    )
    rows = {r["zone"]: r for r in zone_concurrency(visits, horizon_epoch=200).collect()}
    a = rows["A"]
    # A: [0,100) + [50,150) + [100,200): max overlap 2 on [50,100) and
    # exactly at 100 the first exits as the third enters (still 2)
    assert a["n_visits"] == 3 and a["max_concurrent"] == 2
    assert a["occupied_seconds"] == 200
    assert a["user_seconds"] == 100 + 100 + 100  # sum of dwell lengths
    b = rows["B"]
    assert (b["n_visits"], b["max_concurrent"], b["occupied_seconds"],
            b["user_seconds"]) == (1, 1, 190, 190)


def test_image_shard_pack_budget_and_locality(spark):
    """Shards respect the byte budget (single oversized images
    excepted), stay within one bucket, and buckets are contiguous
    Hilbert ranges (spatial locality)."""
    from langtoolsosm_spark.operators.sampling import image_shard_pack

    rng = np.random.default_rng(41)
    n = 400
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"i{j:04d}" for j in range(n)],
                "bytes": [bytes(rng.integers(0, 256, rng.integers(200, 900),
                                             dtype=np.uint8).tolist())
                          for _ in range(n)],
                "lat": rng.uniform(35, 45, n),
                "lon": rng.uniform(-5, 10, n),
            }
        )
    )
    out = image_shard_pack(df, res=6, bucket_shift=6, budget=2000).toPandas()
    assert len(out) == n
    g = out.groupby("shard_id")
    # every shard's bytes fit the budget except where one image alone
    # exceeds it (impossible here: max image 900 < 2000)
    assert (g["size_bytes"].sum() <= 2000 + 900).all()
    # shard -> single bucket; bucket == hkey >> shift for every row
    assert (out["bucket"] == out["hkey"] // 64).all()
    assert (out["shard_id"] // (1 << 32) == out["bucket"]).all()

    with pytest.raises(ValueError):
        image_shard_pack(df, budget=0)
    with pytest.raises(ValueError):
        image_shard_pack(df, res=6, bucket_shift=13)


def test_ivf_pq_candidates_bounded_and_reasonable(spark):
    """IVF-PQ returns at most k per query, only non-self neighbors, and
    on clustered vectors finds same-cluster neighbors in the top ranks
    (the probe must not exclude the home list)."""
    from langtoolsosm_spark.operators.similarity import ivf_pq_ann_topk

    rng = np.random.default_rng(43)
    n, dim = 300, 16
    centers = rng.normal(0, 8, (6, dim))
    emb = centers[np.arange(n) % 6] + rng.normal(0, 0.3, (n, dim))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": [v.tolist() for v in emb]})
    )
    out = ivf_pq_ann_topk(df, k=5, n_centroids=8, nprobe=4, m=4).toPandas()
    assert (out.groupby("query_id").size() <= 5).all()
    assert (out["query_id"] != out["neighbor_id"]).all()
    # same-cluster hit rate at rank 1 should be high on well-separated data
    r1 = out[out["rank"] == 1]
    same = (r1["query_id"] % 6 == r1["neighbor_id"] % 6).mean()
    assert same >= 0.8


def test_idw_loo_excludes_self_and_scores_error(spark):
    from langtoolsosm_spark.operators.spatial import idw_loo_validate

    # three near points with values 0/100/100: the 0-valued point's LOO
    # estimate must be ~100 (its own value excluded)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "point_id": [1, 2, 3, 9],
                "lat": [40.0, 40.01, 40.02, 44.9],   # 9 is isolated
                "lon": [0.0, 0.01, 0.02, 9.9],
                "val": [0, 100, 100, 7],
            }
        )
    )
    rows = {r["target_id"]: r
            for r in idw_loo_validate(pts, radius=0.5, value_col="val").collect()}
    assert rows[1]["n_src"] == 2 and rows[1]["est"] == pytest.approx(100.0)
    assert rows[1]["abs_err"] == pytest.approx(100.0)
    assert rows[9]["n_src"] == 0 and rows[9]["est"] is None


def test_patch_tile_map_center_containment(spark):
    """Every patch's subtile is a child of its image tile; child indices
    follow the center rule and the north-up row convention."""
    from langtoolsosm_spark.operators.images import patch_tile_map

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a"],
                "w": [32], "h": [16],   # nc=4, nr=2 patches
                "lat": [40.0], "lon": [0.0],
            }
        )
    )
    rows = patch_tile_map(df, res=4, sub_levels=2).collect()
    n, m = 16, 4
    ix = int(np.floor((0.0 + 180) / 360 * n))
    iy = int(np.floor((40.0 + 90) / 180 * n))
    assert len(rows) == 8
    for r in rows:
        assert r["tile"] == ix * n + iy
        sx, sy = r["subtile"] // (n * m), r["subtile"] % (n * m)
        assert sx // m == ix and sy // m == iy  # child of the parent tile
        # center rule: nc=4 -> child col == patch col; nr=2 -> centers at
        # 1/4 and 3/4 height = child rows {1, 3} -> north-up offsets {2, 0}
        assert sx % m == r["patch_col"]
        assert sy % m == (2 if r["patch_row"] == 0 else 0)


def test_bounded_shortest_paths_known_graph(spark):
    from langtoolsosm_spark.operators.graphs import bounded_shortest_paths

    # 0->1 (1), 1->2 (1), 0->2 (5), 2->3 (1); hop bound cuts at depth
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 0, 2], "dst": [1, 2, 2, 3],
                      "w": [1, 1, 5, 1]})
    )
    d3 = {r["node"]: r["dist"]
          for r in bounded_shortest_paths(edges, source=0, hops=3).collect()}
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}  # 2 via the 2-hop path
    d1 = {r["node"]: r["dist"]
          for r in bounded_shortest_paths(edges, source=0, hops=1).collect()}
    assert d1 == {0: 0, 1: 1, 2: 5}  # one hop only: direct edge wins
    d0 = {r["node"]: r["dist"]
          for r in bounded_shortest_paths(edges, source=0, hops=0).collect()}
    assert d0 == {0: 0}
    with pytest.raises(ValueError):
        bounded_shortest_paths(edges, source=0, hops=-1)


def test_triangle_counts_known_graph(spark):
    from langtoolsosm_spark.operators.graphs import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, each node in 3) plus a pendant 3-4
    # and a duplicate/reversed edge that must not double count
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": [0, 0, 0, 1, 1, 2, 3, 1, 2],
                "dst": [1, 2, 3, 2, 3, 3, 4, 0, 2],  # (1,0) dup, (2,2) self
            }
        )
    )
    got = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert 4 not in got


def test_clustering_coefficients_known_graph(spark):
    from langtoolsosm_spark.operators.graphs import clustering_coefficients

    # triangle 0-1-2 plus pendant 2-3
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 0, 2], "dst": [1, 2, 2, 3]})
    )
    got = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert got[0]["coeff"] == pytest.approx(1.0)       # deg 2, 1 tri
    assert got[1]["coeff"] == pytest.approx(1.0)
    assert got[2]["coeff"] == pytest.approx(1.0 / 3)   # deg 3, 1 tri
    assert got[3]["coeff"] == 0.0 and got[3]["n_tri"] == 0  # pendant


def test_tile_retention_day_over_day(spark):
    from langtoolsosm_spark.operators.tiling import tile_retention

    # users 1,2 on day 0; user 1 returns day 1 (same tile); user 3 only
    # day 1; a second tile far away with no retention
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 2, 1, 3, 9],
                "ts": pd.to_datetime([10, 20, 86410, 86420, 30], unit="s"),
                "lat": [40.0] * 4 + [10.0],
                "lon": [0.0] * 4 + [100.0],
            }
        )
    )
    rows = {(r["tile"], r["day"]): r for r in tile_retention(df, res=4).collect()}
    # the busy tile appears on two consecutive days with 2 users each
    busy = sorted(k for k in rows if rows[k]["n_users"] == 2)
    assert len(busy) == 2 and busy[1][1] == busy[0][1] + 1
    r0, r1 = rows[busy[0]], rows[busy[1]]
    assert r0["n_retained"] == 1 and r0["retained_milli"] == 500
    assert r1["n_retained"] == 0  # nobody returns on day 2


def test_tile_anomaly_trailing_mean(spark):
    from langtoolsosm_spark.operators.tiling import tile_anomaly

    # one tile: days 0..3 with counts 2,2,2,8 -> day 3 excess vs mean 2
    ts, lats, lons = [], [], []
    for d, c in enumerate([2, 2, 2, 8]):
        for i in range(c):
            ts.append(d * 86400 + i)
            lats.append(40.0)
            lons.append(0.0)
    df = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(ts, unit="s"),
                      "lat": lats, "lon": lons})
    )
    rows = {r["day"]: r for r in tile_anomaly(df, res=4, window_days=7).collect()}
    assert rows[0]["excess_milli"] is None and rows[0]["n_prev"] == 0
    assert rows[1]["excess_milli"] == 0
    # day 3: cnt 8 vs prev mean 2 -> (8*3 - 6)*1000 // 6 = 3000
    assert rows[3]["n_prev"] == 3 and rows[3]["excess_milli"] == 3000


def test_user_home_tile_mode_and_tiebreak(spark):
    from langtoolsosm_spark.operators.tiling import user_home_tile

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2],
                # user 1: 2 visits near (40,0), 1 elsewhere; user 2: tie
                # between two tiles -> smaller tile key wins
                "lat": [40.0, 40.0, 10.0, 40.0, 10.0],
                "lon": [0.0, 0.0, 100.0, 0.0, 100.0],
            }
        )
    )
    rows = {r["entity"]: r for r in user_home_tile(df, res=4).collect()}
    n = 16
    t_main = int((0.0 + 180) / 360 * n) * n + int((40.0 + 90) / 180 * n)
    t_far = int((100.0 + 180) / 360 * n) * n + int((10.0 + 90) / 180 * n)
    assert rows[1]["home_tile"] == t_main and rows[1]["home_milli"] == 666
    assert rows[2]["home_tile"] == min(t_main, t_far)  # deterministic tie


def test_co_visitation_threshold(spark):
    from langtoolsosm_spark.operators.tiling import co_visitation

    # users 1,2 share the tile on days 0,1; user 3 only day 0
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 2, 3, 1, 2],
                "ts": pd.to_datetime([0, 10, 20, 86400, 86410], unit="s"),
                "lat": [40.0] * 5,
                "lon": [0.0] * 5,
            }
        )
    )
    two = {(r["a"], r["b"]): r["n_codays"]
           for r in co_visitation(df, res=4, min_days=2).collect()}
    assert two == {(1, 2): 2}
    one = co_visitation(df, res=4, min_days=1).collect()
    assert {(r["a"], r["b"]) for r in one} == {(1, 2), (1, 3), (2, 3)}

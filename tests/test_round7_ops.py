"""Round-7 operator units: mobility metrics (radius of gyration, dwell,
concentration, first-seen), spatial statistics (LISA quadrants, grid
Ripley K), gravity residuals."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "epoch", "event_id", "lat", "lon"])
    return spark.createDataFrame(pdf).select(
        "user_id",
        F.timestamp_seconds("epoch").alias("ts"),
        "event_id", "lat", "lon",
    )


def test_radius_of_gyration_matches_numpy(spark):
    from langtoolsosm_spark.operators.tiling import radius_of_gyration

    rng = np.random.RandomState(3)
    lats = 35 + rng.rand(40) * 10
    lons = -5 + rng.rand(40) * 15
    rows = [(1, i, i, float(lats[i]), float(lons[i])) for i in range(40)]
    out = radius_of_gyration(_ev(spark, rows)).collect()[0]
    x = np.floor(lats * 1e6).astype(np.int64)
    y = np.floor(lons * 1e6).astype(np.int64)
    n = len(x)
    num = n * (int((x.astype(object) ** 2).sum()) + int((y.astype(object) ** 2).sum())) \
        - int(x.sum()) ** 2 - int(y.sum()) ** 2
    assert int(out["rg2_num"]) == num
    assert int(out["rg2_den"]) == n * n
    # cross-check against float rg^2 (mean squared distance from centroid)
    rg2 = ((x - x.mean()) ** 2 + (y - y.mean()) ** 2).mean()
    assert abs(num / (n * n) - rg2) / rg2 < 1e-9


def test_dwell_time_attributes_to_from_tile(spark):
    from langtoolsosm_spark.functions.cells import tile_key
    from langtoolsosm_spark.operators.tiling import dwell_time

    # user 1: t0 in A (dwell 100), t100 in B (dwell 50), t150 in A (open)
    rows = [
        (1, 0, 0, 10.0, 10.0),
        (1, 100, 1, 40.0, 40.0),
        (1, 150, 2, 10.0, 10.0),
    ]
    out = {r["tile"]: r for r in dwell_time(_ev(spark, rows), res=6).collect()}
    a = int(tile_key(np.array([10.0]), np.array([10.0]), 6)[0])
    b = int(tile_key(np.array([40.0]), np.array([40.0]), 6)[0])
    assert out[a]["total_dwell_s"] == 100 and out[a]["n_segments"] == 1
    assert out[b]["total_dwell_s"] == 50 and out[b]["n_segments"] == 1


def test_visit_concentration_hhi(spark):
    from langtoolsosm_spark.operators.tiling import visit_concentration

    # user 1: 3 visits to one tile, 1 to another -> hhi_num 10, top 750
    rows = [
        (1, 0, 0, 10.0, 10.0),
        (1, 1, 1, 10.0, 10.0),
        (1, 2, 2, 10.0, 10.0),
        (1, 3, 3, 40.0, 40.0),
    ]
    out = visit_concentration(_ev(spark, rows), res=6).collect()[0]
    assert out["n_events"] == 4 and out["n_tiles"] == 2
    assert out["hhi_num"] == 9 + 1
    assert out["top_milli"] == 750


def test_tile_first_seen(spark):
    from langtoolsosm_spark.operators.tiling import tile_first_seen

    rows = [
        (1, 0, 0, 10.0, 10.0),
        (2, 86400 * 3 + 5, 1, 10.0, 10.0),
        (1, 86400 * 5, 2, 40.0, 40.0),
    ]
    out = {r["tile"]: r for r in tile_first_seen(_ev(spark, rows), res=6).collect()}
    vals = sorted((r["first_day"], r["n_days"], r["n_events"]) for r in out.values())
    assert vals == [(0, 2, 2), (5, 1, 1)]


def test_lisa_quadrants_tiny_grid(spark):
    """A 100-point cell next to a 1-point cell on a sparse grid: both
    cells' own counts exceed the global mean (101/256 < 1 — on a sparse
    grid every OCCUPIED cell is high), so the hot cell classifies HL
    (cold neighborhood) and its small neighbor HH (the hot cell
    dominates its ring). Exact integer cross-multiplication decides
    both; the L-own classes need mean > 1 grids (exercised by the
    sf0.01 oracle gate)."""
    from langtoolsosm_spark.functions.cells import tile_key
    from langtoolsosm_spark.operators.spatial import lisa_quadrants

    # res 4 grid: 100 points in one cell, 1 point in an adjacent cell
    rows = [(1, i, i, 10.0, 10.0) for i in range(100)]
    rows += [(1, 200, 200, 10.0, 25.0)]  # next cell over at res 4 (11.25 deg)
    out = {r["tile"]: r["quad"] for r in lisa_quadrants(_ev(spark, rows), res=4).collect()}
    hot = int(tile_key(np.array([10.0]), np.array([10.0]), 4)[0])
    small = int(tile_key(np.array([10.0]), np.array([25.0]), 4)[0])
    assert out[hot] == "HL"
    assert out[small] == "HH"


def test_ripley_k_matches_bruteforce(spark):
    from langtoolsosm_spark.operators.spatial import ripley_k

    rng = np.random.RandomState(5)
    lats = 35 + rng.rand(60) * 10
    lons = -5 + rng.rand(60) * 15
    rows = [(1, i, i, float(lats[i]), float(lons[i])) for i in range(60)]
    res = 5
    n = 1 << res
    ix = np.clip(np.floor((lons + 180) / 360 * n), 0, n - 1).astype(int)
    iy = np.clip(np.floor((lats + 90) / 180 * n), 0, n - 1).astype(int)
    out = {r["r"]: r for r in ripley_k(_ev(spark, rows), res=res, radii=(1, 2)).collect()}
    for r in (1, 2):
        brute = sum(
            1
            for i in range(60)
            for j in range(60)
            if i != j and max(abs(ix[i] - ix[j]), abs(iy[i] - iy[j])) <= r
        )
        assert out[r]["n_pairs"] == brute
        assert out[r]["n_points"] == 60


def test_od_gravity_residual_identity(spark):
    """Sum of observed flows equals T; expectations are the documented
    truncating integer division."""
    from langtoolsosm_spark.operators.spatial import od_gravity_residual

    rows = [
        (1, 0, 0, 10.0, 10.0),
        (1, 10, 1, 40.0, 40.0),
        (2, 0, 2, 10.0, 10.0),
        (2, 10, 3, 40.0, 40.0),
        (2, 20, 4, 10.0, 10.0),
    ]
    out = od_gravity_residual(
        _ev(spark, rows), "user_id", "ts", res=5, order_tiebreak="event_id"
    ).collect()
    t = sum(r["n_trips"] for r in out)
    assert t == 3
    for r in out:
        d2 = r["d2"]
        expect = (1000 * r["out_from"] * r["in_to"]) // (t * (1 + d2))
        assert r["exp_milli"] == expect
        assert r["resid_milli"] == 1000 * r["n_trips"] - expect


def test_lisa_quadrants_low_classes(spark):
    """On a dense coarse grid (mean > 1 per cell) the L-own classes
    appear: a 1-point cell far from the hot cluster is LL, a 1-point
    cell adjacent to it is LH."""
    from langtoolsosm_spark.functions.cells import tile_key
    from langtoolsosm_spark.operators.spatial import lisa_quadrants

    # res 2 grid (16 cells of 45 deg): 30 points in cell A, 1 point in
    # the cell east of A (LH candidate), 1 point far away (LL candidate)
    rows = [(1, i, i, 10.0, 10.0) for i in range(30)]
    rows += [(1, 100, 100, 10.0, 100.0)]   # adjacent cell (res-2 cells are 90 deg wide)
    rows += [(1, 101, 101, -60.0, -120.0)]  # far cell
    out = {r["tile"]: r["quad"] for r in lisa_quadrants(_ev(spark, rows), res=2).collect()}
    adj = int(tile_key(np.array([10.0]), np.array([100.0]), 2)[0])
    far = int(tile_key(np.array([-60.0]), np.array([-120.0]), 2)[0])
    assert out[adj] == "LH"
    assert out[far] == "LL"


def test_pagerank_int_hub_dominates(spark):
    """A star graph's hub must out-rank the leaves, and the integer
    recurrence must match a hand-rolled replay."""
    from langtoolsosm_spark.operators.graphs import pagerank_int

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)],
        "src long, dst long",
    )
    out = {r["node"]: r["rank_int"] for r in pagerank_int(edges, iters=3).collect()}
    assert out[0] > max(out[i] for i in range(1, 5))
    # replay: hub outdeg 4, leaves outdeg 1
    r = {v: 1_000_000 for v in range(5)}
    for _ in range(3):
        contrib = {v: r[v] // (4 if v == 0 else 1) for v in range(5)}
        nxt = {0: 150_000 + (850 * sum(contrib[i] for i in range(1, 5))) // 1000}
        for i in range(1, 5):
            nxt[i] = 150_000 + (850 * contrib[0]) // 1000
        r = nxt
    assert out == r


def test_pagerank_int_dangling_documented(spark):
    """A dangling node keeps its base rank (its inflow), and the mass it
    received is dropped, not redistributed — the documented contract."""
    from langtoolsosm_spark.operators.graphs import pagerank_int

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r["node"]: r["rank_int"] for r in pagerank_int(edges, iters=1).collect()}
    assert out[1] == 150_000                      # no inflow
    assert out[2] == 150_000 + (850 * 1_000_000) // 1000


def test_kcore_peels_iteratively(spark):
    """A triangle with a pendant chain: k=2 removes the chain end, then
    the newly-exposed chain node — two rounds needed, triangle
    survives with degree 2 each."""
    from langtoolsosm_spark.operators.graphs import kcore

    # triangle 1-2-3 + chain 3-4, 4-5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {r["node"]: r["deg"] for r in kcore(edges, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}

    one_round = {
        r["node"]: r["deg"] for r in kcore(edges, k=2, rounds=1).collect()
    }
    # after one round only node 5 is gone; 4 still present (deg 1 now)
    assert set(one_round) == {1, 2, 3, 4}


def test_capture_bursts_groups_same_scene(spark):
    from langtoolsosm_spark.operators.images import capture_bursts

    pdf = pd.DataFrame(
        {
            "image_id": ["a", "b", "c", "d"],
            "phash": [
                (7 << 48) + 1, (7 << 48) + 9,   # same band, same tile
                (9 << 48) + 1,                   # other band
                (7 << 48) + 1,                   # same band, other tile
            ],
            "lat": [10.0, 10.0, 10.0, 40.0],
            "lon": [10.0, 10.0, 10.0, 40.0],
        }
    )
    out = capture_bursts(spark.createDataFrame(pdf), res=6, min_n=2).collect()
    assert len(out) == 1
    assert out[0]["band"] == 7
    assert out[0]["n_images"] == 2 and out[0]["n_distinct_phash"] == 2


def test_region_image_stats_counts_overlaps_per_region(spark, synth_dir):
    """Non-unique PIP: an image inside two overlapping regions counts in
    both; totals match a per-polygon brute-force on the synth fixture."""
    from langtoolsosm_spark.operators.images import region_image_stats
    from langtoolsosm_spark.plans.driver_queries import geo_polygons_df

    images = spark.read.parquet(f"{synth_dir}/images.parquet")
    out = {
        r["polygon_id"]: r
        for r in region_image_stats(images, geo_polygons_df(spark), res=8).collect()
    }
    assert out  # at least one region covered
    for r in out.values():
        assert r["n_images"] >= r["n_tiles"] >= 1
        assert r["sum_bytes"] > 0 and r["max_px"] > 0


def test_snap_to_boundary_exact_geometry(spark):
    """Hand-checkable cases: interior projection, endpoint clamp, and
    the truncating cross^2 div len^2 arithmetic."""
    from langtoolsosm_spark.operators.spatial import snap_to_boundary

    polys = spark.createDataFrame(
        [("P", [{"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 1.0},
                {"lat": 1.0, "lon": 1.0}])],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),    # above seg 0 midpoint: d = 0.5 deg vertically
            (2, -1.0, -1.0),  # beyond seg-0 start: clamps to vertex (0,0)
        ],
        "point_id long, lat double, lon double",
    )
    out = {r["point_id"]: r for r in snap_to_boundary(pts, polys).collect()}
    # point 1: nearest is the hypotenuse seg 2 from (1,1) to (0,0):
    # distance 0 (it lies on y=x)? lat=lon=0.5 -> exactly on that line
    assert out[1]["d2"] == 0 and out[1]["seg_idx"] == 2
    # point 2: clamps to vertex (0,0) of seg 0: d2 = (1e6)^2 + (1e6)^2
    assert out[2]["d2"] == 2 * 10**12
    assert out[2]["polygon_id"] == "P"


def test_snap_to_boundary_raises_on_huge_dim(spark):
    from langtoolsosm_spark.operators.spatial import snap_to_boundary

    polys = spark.createDataFrame(
        [("P", [{"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 1.0},
                {"lat": 1.0, "lon": 1.0}])],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    pts = spark.createDataFrame([(1, 0.5, 0.5)], "point_id long, lat double, lon double")
    with pytest.raises(ValueError, match="broadcast threshold"):
        snap_to_boundary(pts, polys, broadcast_threshold=2)


def test_binomial_smooth_121_kernel(spark):
    """k=1 -> 1-2-1 separable weights: a single occupied cell spreads a
    3x3 stamp of [[1,2,1],[2,4,2],[1,2,1]]."""
    from langtoolsosm_spark.functions.cells import tile_key
    from langtoolsosm_spark.operators.tiling import binomial_smooth

    df = spark.createDataFrame(pd.DataFrame({"lat": [10.0], "lon": [10.0]}))
    out = {r["tile"]: r["smooth_sum"] for r in binomial_smooth(df, res=5, k=1).collect()}
    n = 1 << 5
    c = int(tile_key(np.array([10.0]), np.array([10.0]), 5)[0])
    cx, cy = c // n, c % n
    want = {}
    for dx, wx in [(-1, 1), (0, 2), (1, 1)]:
        for dy, wy in [(-1, 1), (0, 2), (1, 1)]:
            want[(cx + dx) * n + (cy + dy)] = wx * wy
    assert out == want


def test_tile_gini_bounds(spark):
    """Uniform occupancy -> gini 0; extreme concentration -> high gini;
    the rational identity holds."""
    from langtoolsosm_spark.operators.tiling import tile_gini

    uni = spark.createDataFrame(
        pd.DataFrame({"lat": [10.0, 40.0], "lon": [10.0, 40.0]})
    )
    r = tile_gini(uni, res=5).collect()[0]
    assert r["gini_num"] == 0 and r["gini_milli"] == 0

    skew = spark.createDataFrame(
        pd.DataFrame({"lat": [10.0] * 99 + [40.0], "lon": [10.0] * 99 + [40.0]})
    )
    r = tile_gini(skew, res=5).collect()[0]
    assert r["n_tiles"] == 2 and r["total"] == 100
    # ranks: x=(1,99) -> num = 2*(1*1+2*99) - 3*100 = 98; den = 200
    assert r["gini_num"] == 98 and r["gini_den"] == 200
    assert r["gini_milli"] == 490


def test_staypoints_anchor_semantics(spark):
    """Li et al. anchor rule: the segment grows while points stay within
    the radius of the FIRST point; a break starts the next anchor; only
    segments meeting the duration emit."""
    from langtoolsosm_spark.operators.spatial import staypoints

    # user 1: 3 points near (10,10) over 2000s (staypoint), then a jump
    # to (40,40) with only 2 points over 10s (too short)
    rows = [
        (1, 0, 0, 10.0, 10.0),
        (1, 1000, 1, 10.001, 10.001),
        (1, 2000, 2, 10.002, 10.002),
        (1, 3000, 3, 40.0, 40.0),
        (1, 3010, 4, 40.001, 40.0),
    ]
    ev = _ev(spark, rows)
    out = staypoints(ev, dist_micro=10_000, min_stay_s=1500).collect()
    assert len(out) == 1
    sp = out[0]
    assert (sp["start_rn"], sp["end_rn"], sp["n_pts"]) == (1, 3, 3)
    assert sp["end_ep"] - sp["start_ep"] == 2000
    # anchor coords are the first point's micro-degree quantization
    assert sp["ax"] == int((10.0 + 180.0) * 1e6)
    assert sp["ay"] == int((10.0 + 90.0) * 1e6)


def test_tile_flow_divergence_conservation(spark):
    """Sum of nets is zero (every trip leaves one tile and enters
    another) and intra-tile transitions are excluded."""
    from langtoolsosm_spark.operators.spatial import tile_flow_divergence

    rows = [
        (1, 0, 0, 10.0, 10.0),
        (1, 10, 1, 40.0, 40.0),
        (1, 20, 2, 40.001, 40.001),  # intra-tile: excluded
        (2, 0, 3, 10.0, 10.0),
        (2, 10, 4, 40.0, 40.0),
    ]
    out = tile_flow_divergence(
        _ev(spark, rows), "user_id", "ts", res=5, order_tiebreak="event_id"
    ).collect()
    assert sum(r["net"] for r in out) == 0
    assert sum(r["inflow"] for r in out) == 2  # two cross-tile trips


def test_tile_burstiness_fano(spark):
    """All events on one day in one tile, span anchored by another tile:
    fano = (D*x^2 - x^2) / (D*x) = x*(D-1)/D exactly."""
    from langtoolsosm_spark.operators.tiling import tile_burstiness

    rows = [(1, 10, i, 10.0, 10.0) for i in range(4)]          # day 0, tile A
    rows += [(1, 86400 * 9 + 10, 99, 40.0, 40.0)]              # day 9, tile B
    out = {r["tile"]: r for r in tile_burstiness(_ev(spark, rows), res=5).collect()}
    a = [r for r in out.values() if r["total"] == 4][0]
    # D = 10 days span; x = 4 on one day: num = 10*16 - 16 = 144, den = 40
    assert (a["fano_num"], a["fano_den"], a["fano_milli"]) == (144, 40, 3600)


def test_weekday_contrast_split(spark):
    from langtoolsosm_spark.operators.tiling import weekday_contrast

    # epoch day 0 = Thursday (dow (0+4)%7=4, weekday);
    # day 2 = Saturday (dow 6, weekend)
    rows = [(1, 10, 0, 10.0, 10.0), (1, 86400 * 2 + 10, 1, 10.0, 10.0),
            (1, 86400 * 2 + 20, 2, 10.0, 10.0)]
    r = weekday_contrast(_ev(spark, rows), res=5).collect()[0]
    assert (r["n_weekday"], r["n_weekend"], r["weekday_milli"]) == (1, 2, 333)


def test_source_overlap_exact_jaccard(spark):
    from langtoolsosm_spark.operators.textstats import source_overlap

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the cat sat", "the cat ran", "dogs bark loud"],
            "source": ["A", "B", "B"],
        }
    )
    out = source_overlap(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    # A bigrams: {the cat, cat sat}; B: {the cat, cat ran, dogs bark, bark loud}
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 4, 1)
    assert r["jaccard_milli"] == 200


def test_polygon_adjacency_shared_edge(spark):
    """Two squares sharing one edge are adjacent with exactly one shared
    canonical segment regardless of ring winding direction."""
    from langtoolsosm_spark.operators.spatial import polygon_adjacency

    # A: (0,0)-(0,1)-(1,1)-(1,0)  (ccw); B shares the x=1 edge but winds
    # the other way, so the shared segment appears in opposite order
    A = [{"lat": 0.0, "lon": 0.0}, {"lat": 1.0, "lon": 0.0},
         {"lat": 1.0, "lon": 1.0}, {"lat": 0.0, "lon": 1.0}]
    B = [{"lat": 0.0, "lon": 1.0}, {"lat": 1.0, "lon": 1.0},
         {"lat": 1.0, "lon": 2.0}, {"lat": 0.0, "lon": 2.0}]
    C = [{"lat": 5.0, "lon": 5.0}, {"lat": 6.0, "lon": 5.0},
         {"lat": 6.0, "lon": 6.0}]
    polys = spark.createDataFrame(
        [("A", A), ("B", B), ("C", C)],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    out = polygon_adjacency(polys).collect()
    assert len(out) == 1
    assert (out[0]["pid_a"], out[0]["pid_b"], out[0]["n_shared_edges"]) == ("A", "B", 1)


def test_tile_changepoint_gap_edges(spark):
    """A 50-event day followed by a 3-day gap: the biggest |jump| is the
    fall-to-zero on the day AFTER the burst, not the later small rise."""
    from langtoolsosm_spark.operators.tiling import tile_changepoint

    rows = [(1, 10 + i, i, 10.0, 10.0) for i in range(50)]          # day 0
    rows += [(1, 86400 * 4 + 10, 100, 10.0, 10.0)]                  # day 4
    r = tile_changepoint(_ev(spark, rows), res=5).collect()[0]
    assert (r["jump_day"], r["jump"], r["prev_cnt"], r["day_cnt"]) == (1, -50, 50, 0)


def test_activity_streaks_islands(spark):
    from langtoolsosm_spark.operators.tiling import activity_streaks

    # user 1 active on days 0,1,2, 5,6, 9 -> 3 streaks, longest 3 @ day 0
    days = [0, 1, 2, 5, 6, 9]
    rows = [(1, d * 86400 + 7, i, 10.0, 10.0) for i, d in enumerate(days)]
    r = activity_streaks(_ev(spark, rows)).collect()[0]
    assert (r["n_active_days"], r["n_streaks"]) == (6, 3)
    assert (r["longest_streak"], r["longest_streak_start"]) == (3, 0)

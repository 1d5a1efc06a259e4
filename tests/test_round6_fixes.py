"""Round-6 regression pins: ADVICE guards (trajectory_resample zero-length
segments, hex_bin negative quantization, with_hilbert range) and the
near-Nyquist image-quality fixture (VERDICT r5 item 5)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_trajectory_resample_drops_zero_length_segments(spark):
    """Duplicate timestamps (t0 == t1) span an empty half-open interval:
    no sample may be emitted, and in particular t0 = t1 = 0 must not
    produce a frac = 0/0 NaN row (ADVICE r5)."""
    from langtoolsosm_spark.operators.spatial import trajectory_resample

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": ["u"] * 3,
                "ts": [0, 0, 100],
                "lat": [1.0, 2.0, 3.0],
                "lon": [1.0, 2.0, 3.0],
                "event_id": [0, 1, 2],
            }
        )
    )
    rows = trajectory_resample(
        df, step=10, entity_col="user_id", ts_col="ts",
        order_tiebreak="event_id",
    ).collect()
    # only the (0 -> 100) segment contributes: lattice 0,10,...,90
    assert len(rows) == 10
    assert all(np.isfinite(r["lat"]) and np.isfinite(r["lon"]) for r in rows)


def test_hex_bin_raises_on_negative_quantized_coords(spark):
    from langtoolsosm_spark.operators.spatial import hex_bin

    df = spark.createDataFrame(pd.DataFrame({"lat": [10.0], "lon": [0.0]}))
    with pytest.raises(Exception, match="hex_bin"):
        hex_bin(df).collect()  # lat 10 << lat_off 35 -> negative Y


def test_with_hilbert_raises_out_of_range(spark):
    from langtoolsosm_spark.operators.spatial import with_hilbert

    df = spark.createDataFrame(pd.DataFrame({"ix": [5, 70000], "iy": [1, 1]}))
    with pytest.raises(Exception, match="with_hilbert"):
        with_hilbert(df, res=16).collect()
    neg = spark.createDataFrame(pd.DataFrame({"ix": [-1], "iy": [0]}))
    with pytest.raises(Exception, match="with_hilbert"):
        with_hilbert(neg, res=16).collect()


def test_quality_fixture_nyquist(spark):
    """The staged adversarial fixture: the 2-px-period (near-Nyquist)
    colored checkerboard is NOT dropped for edge density, while the
    1-px checkerboard shows the exact Sobel cancellation (edge 0 at
    maximal contrast) and flat/ramp images drop."""
    from langtoolsosm_spark.datagen import ensure_quality_images
    from langtoolsosm_spark.operators.images import image_quality

    df = spark.read.parquet(ensure_quality_images("sf0.001"))
    got = {r["image_id"]: r for r in image_quality(df).collect()}
    assert len(got) == 6

    nyq = got["qlt000000000"]
    assert nyq["edge_milli"] >= 5, "near-Nyquist texture must clear the edge gate"
    assert nyq["keep"] == 1

    cb1 = got["qlt000000001"]
    assert cb1["edge_milli"] == 0, "1-px checkerboard: Sobel cancels exactly"
    assert cb1["lum_var"] > 0 and cb1["keep"] == 0

    flat = got["qlt000000002"]
    assert (flat["edge_milli"], flat["lum_var"], flat["keep"]) == (0, 0, 0)
    assert got["qlt000000003"]["keep"] == 0


def test_geo_clusters_hot_band_scale_path(spark):
    """The unbounded hot-component scale path (VERDICT r5): the oracle
    gate excludes the hot band because the DuckDB recursive-reachability
    oracle is quadratic in component size, but the ENGINE must handle it.
    Run geo_clusters over the full sf0.1 1-in-13 sample INCLUDING the
    hot box (~2.3k-node single component) and assert the label-
    propagation invariants directly, no oracle:

    * every input point gets exactly one label;
    * labels are canonical (cluster_id <= point_id, and each cluster id
      labels itself);
    * every radius edge connects same-labeled points (label constant per
      component — with canonicality this makes the label exactly the
      component min);
    * the hot component is genuinely large, so the test exercises the
      scale path the gate fixture bounds away;
    * convergence under max_iter (dedup_clusters raises otherwise).
    """
    import os

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 testdata not present")
    from langtoolsosm_spark.operators.spatial import distance_join, geo_clusters
    from langtoolsosm_spark.plans.driver_queries import geo_points

    pts = geo_points(spark, sf_dir).filter(F.col("point_id") % 13 == 0)
    n_pts = pts.count()
    labels = geo_clusters(pts, radius=0.05).localCheckpoint(eager=True)

    # one label per point
    assert labels.count() == n_pts
    assert labels.select("point_id").distinct().count() == n_pts

    # canonical labels: min-label means cluster_id <= point_id, and the
    # labeling node itself must carry its own id
    assert labels.filter(F.col("cluster_id") > F.col("point_id")).count() == 0
    roots = labels.select(F.col("cluster_id").alias("point_id")).distinct()
    bad_roots = (
        roots.join(labels, "point_id")
        .filter(F.col("cluster_id") != F.col("point_id"))
        .count()
    )
    assert bad_roots == 0

    # every radius edge is label-consistent (complete check, not sampled)
    pairs = distance_join(
        pts,
        pts.select(
            F.col("point_id").alias("id"),
            F.col("lat").alias("lat"),
            F.col("lon").alias("lon"),
        ),
        0.05,
    ).filter(F.col("point_id") < F.col("neighbor_id"))
    la = labels.withColumnRenamed("cluster_id", "lbl_a")
    lb = labels.select(
        F.col("point_id").alias("neighbor_id"), F.col("cluster_id").alias("lbl_b")
    )
    inconsistent = (
        pairs.join(la, "point_id").join(lb, "neighbor_id")
        .filter(F.col("lbl_a") != F.col("lbl_b"))
        .count()
    )
    assert inconsistent == 0

    # the hot box is one big component: without it the test would not
    # cover the path the oracle fixture bounds away
    biggest = (
        labels.groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest >= 2000, f"hot component missing (max component {biggest})"


def test_resize_nn_hand_check(spark):
    """Resize a known 4x2 image to 2x2 and check the checksum/mean against
    the direct NumPy computation of the same index map."""
    from langtoolsosm_spark.functions import imagecodec as ic
    from langtoolsosm_spark.operators.images import resize_nn

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (2, 4, 3)).astype(np.uint8)  # h=2, w=4
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["a"], "bytes": [ic.encode(px, "raw")],
                      "fmt": ["raw"]})
    )
    out = resize_nn(df, out_w=2, out_h=2).collect()[0]
    idx_r = (np.arange(2) * 2) // 2
    idx_c = (np.arange(2) * 4) // 2
    rs = px.astype(np.int64)[idx_r][:, idx_c]
    wts = (3 * (np.arange(2)[:, None] * 2 + np.arange(2))[..., None]
           + np.arange(3) + 1)
    assert out["chk"] == int((rs * wts).sum())
    assert out["mean_milli"] == 1000 * int(rs.sum()) // 12
    with pytest.raises(ValueError):
        resize_nn(df, out_w=0)


def test_exposure_and_letterbox_fixtures(spark):
    """Quality fixtures drive both new curation filters end to end."""
    from langtoolsosm_spark.datagen import ensure_quality_images
    from langtoolsosm_spark.operators.images import (
        image_exposure,
        letterbox_detect,
    )

    df = spark.read.parquet(ensure_quality_images("sf0.001"))
    exp = {r["image_id"]: r for r in image_exposure(df).collect()}
    # flat 128 never clips; the letterbox frame's black bands crush 6/16
    # rows plus the dark half of the center texture
    assert exp["qlt000000002"]["under_milli"] == 0
    assert exp["qlt000000002"]["over_milli"] == 0
    assert exp["qlt000000002"]["well_exposed"] == 1
    assert exp["qlt000000004"]["under_milli"] > 200
    assert exp["qlt000000004"]["well_exposed"] == 0

    box = {r["image_id"]: r for r in letterbox_detect(df).collect()}
    lb = box["qlt000000004"]
    assert (lb["top_rows"], lb["bottom_rows"], lb["boxed"]) == (3, 3, 1)
    pb = box["qlt000000005"]
    assert (pb["left_cols"], pb["right_cols"], pb["boxed"]) == (2, 2, 1)
    flat = box["qlt000000002"]
    assert flat["top_rows"] == 16 and flat["boxed"] == 0
    nyq = box["qlt000000000"]
    assert nyq["boxed"] == 0 and nyq["top_rows"] == 0


def test_coverage_gaps_invariants(spark):
    """Lattice anti-join: gaps + occupied-in-window partitions the
    window; a point's own cell is never a gap."""
    from langtoolsosm_spark.operators.tiling import coverage_gaps

    pdf = pd.DataFrame({"lat": [35.1, 44.9, 40.0], "lon": [-4.9, 9.9, 2.0]})
    df = spark.createDataFrame(pdf)
    res = 8
    gaps = coverage_gaps(df, res=res, lat0=35.0, lat1=45.0, lon0=-5.0, lon1=10.0)
    g = gaps.collect()
    n = 1 << res
    import math

    cell = lambda v, off, span: max(0, min(n - 1, math.floor((v + off) / span * n)))
    ix0, ix1 = cell(-5.0, 180.0, 360.0), cell(10.0, 180.0, 360.0)
    iy0, iy1 = cell(35.0, 90.0, 180.0), cell(45.0, 90.0, 180.0)
    window_cells = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    occ = {(cell(lo, 180.0, 360.0), cell(la, 90.0, 180.0))
           for la, lo in zip(pdf["lat"], pdf["lon"])}
    assert len(g) == window_cells - len(occ)
    gap_set = {(r["ix"], r["iy"]) for r in g}
    assert not (gap_set & occ)
    for r in g:
        assert r["tile"] == (r["ix"] << res) + r["iy"]


def test_pip_anti_join_complement(spark, synth_dir):
    """pip_anti_join is the exact complement of pip_join on point ids."""
    from langtoolsosm_spark.operators.pip_join import pip_anti_join, pip_join
    from langtoolsosm_spark.plans.driver_queries import (
        geo_points,
        geo_polygons_df,
    )

    pts = geo_points(spark, "/root/testdata/sf0.001")
    polys = geo_polygons_df(spark)
    total = pts.count()
    inside = (
        pip_join(pts, polys, res=8, id_col="point_id")
        .select("point_id").distinct().count()
    )
    outside = pip_anti_join(pts, polys, res=8, id_col="point_id").count()
    assert inside + outside == total and outside > 0


def test_pq_family(spark):
    """PQ compression + ADC retrieval invariants on the sf0.001
    embeddings: m codes per vector in [0, k_codes); ADC ranks ascending
    and contiguous; two-stage rescoring recovers most of the recall the
    32-bit codes lose (everything integer-exact, so the recall numbers
    are deterministic)."""
    from langtoolsosm_spark.operators.similarity import (
        pq_ann_rescored,
        pq_ann_topk,
        pq_encode,
        topk_dot_kernel,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()

    codes = pq_encode(emb).collect()
    assert len(codes) == n * 8
    assert all(0 <= r["code"] < 16 for r in codes)
    per_vec = {}
    for r in codes:
        per_vec.setdefault(r["vec_id"], set()).add(r["s"])
    assert all(v == set(range(8)) for v in per_vec.values())

    ann = pq_ann_topk(emb, k=3).collect()
    by_q = {}
    for r in ann:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        adcs = [r["adc"] for r in rows]
        assert adcs == sorted(adcs) and adcs[0] >= 0
        assert all(r["neighbor_id"] != q for r in rows)

    exact = topk_dot_kernel(emb).select("query_id", "neighbor_id")
    n_true = exact.count()

    def recall(approx):
        return (
            exact.join(
                approx.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"], "left_semi",
            ).count() / n_true
        )

    r_adc = recall(pq_ann_topk(emb))
    r_res = recall(pq_ann_rescored(emb))
    assert r_res >= 0.6, f"rescored recall {r_res}"
    assert r_res > r_adc, "rescoring must beat pure ADC"

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
    assert len(got) == 4

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

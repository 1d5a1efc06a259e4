"""Round-5 VERDICT/ADVICE follow-ups: kNN full-disk clamp, snapshot
stats dtype guard, expire lineage preservation, bounded Observation wait,
rawseq truncation handling, batched video pHash."""

import numpy as np
import pandas as pd
import pytest


def test_knn_cogroup_schedule_clamps_to_full_disk(spark):
    """On a grid so coarse that the radius schedule (1, 4, 16, ...)
    overshoots n, knn_join must clamp to the radius-(n-1) full disk and
    still return the exact brute-force answer — the overshoot used to be
    absorbed incidentally by the wrap arithmetic, now it would raise."""
    from langtoolsosm_spark.operators.knn import knn_join

    pts = [(i, -80.0 + i * 7.9, -170.0 + i * 16.9) for i in range(20)]
    fts = [(100 + j, -75.0 + j * 5.3, -160.0 + j * 11.7) for j in range(30)]
    pts_df = spark.createDataFrame(pd.DataFrame(pts, columns=["image_id", "lat", "lon"]))
    fts_df = spark.createDataFrame(pd.DataFrame(fts, columns=["id", "lat", "lon"]))
    # res=2 -> n=4: round 1 radius 1, round 2 schedule 4 -> clamped to 3
    got = (
        knn_join(pts_df, fts_df, k=3, broadcast_threshold=0, res=2,
                 brute_max_pairs=0)
        .toPandas().sort_values(["image_id", "rank"]).reset_index(drop=True)
    )
    P = np.array([[p[1], p[2]] for p in pts])
    Fm = np.array([[f[1], f[2]] for f in fts])
    fids = np.array([f[0] for f in fts])
    d = (P[:, None, 0] - Fm[None, :, 0]) ** 2 + (P[:, None, 1] - Fm[None, :, 1]) ** 2
    rows = []
    for i, p in enumerate(pts):
        o = np.lexsort((fids, d[i]))[:3]
        rows.append([(p[0], fids[j], r + 1) for r, j in enumerate(o)])
    exp = pd.DataFrame(
        [t for rr in rows for t in rr], columns=["image_id", "neighbor_id", "rank"]
    ).sort_values(["image_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["image_id", "neighbor_id", "rank"]], exp, check_dtype=False
    )

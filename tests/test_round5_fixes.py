"""Round-5 VERDICT/ADVICE follow-ups: kNN full-disk clamp, snapshot
stats dtype guard, expire lineage preservation, bounded Observation wait,
rawseq truncation handling, batched video pHash."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


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


def test_phash64_batch_matches_scalar():
    from langtoolsosm_spark.functions import imagecodec as ic

    rng = np.random.default_rng(7)
    for h, w in [(12, 10), (32, 32), (33, 47), (8, 8)]:
        frames = rng.integers(0, 256, (9, h, w, 3), dtype=np.uint8)
        got = ic.phash64_batch(frames)
        exp = np.array([ic.phash64(f) for f in frames], dtype=np.int64)
        assert (got == exp).all(), (h, w)
    assert len(ic.phash64_batch(np.empty((0, 4, 4, 3), dtype=np.uint8))) == 0


def test_truncated_rawseq_clamps_to_whole_frames(spark):
    """ADVICE r4: truncated clips yield their decodable whole-frame prefix
    (mirroring pcm16's trailing-byte leniency); a buffer shorter than the
    header raises a clear error, not an opaque reshape ValueError."""
    from langtoolsosm_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(5)]
    buf = mm.encode_video_rawseq(frames)
    sz = 6 * 5 * 3
    truncated = buf[: 16 + 3 * sz + sz // 2]  # 3.5 frames survive
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["t"], "bytes": [truncated], "fmt": ["rawseq"]})
    )
    out = mm.sample_video_frames(df, every_n=1).toPandas().sort_values("frame_idx")
    assert list(out.frame_idx) == [0, 1, 2]
    assert (out.n_frames == 3).all()
    cuts = mm.video_scene_cuts(df).toPandas()
    assert list(cuts.frame_idx) == [1, 2]
    with pytest.raises(ValueError, match="header"):
        mm._video_header(buf[:10])
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_video_frame(truncated, 4)


def test_compact_stats_col_must_be_integral(spark, tmp_path):
    """ADVICE r4: int() on float stats truncates toward zero and narrows
    the recorded min/max -> wrong pruning. Non-integral stats columns must
    fail loudly in compact_table AND write_partitioned."""
    from langtoolsosm_spark.sources.snapshots import (
        SnapshotTable,
        compact_table,
        write_partitioned,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": [-3.7, 0.5, 2.2]})
    )
    t = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(TypeError, match="integral"):
        write_partitioned(df, t, "k", stats_col="v")
    write_partitioned(df, t, "k", stats_col="k")
    with pytest.raises(TypeError, match="integral"):
        compact_table(t, spark, target_files=1, stats_col="v")
    with pytest.raises(TypeError, match="integral"):
        compact_table(t, spark, target_files=1, zorder_cols=("k", "v"))
    compact_table(t, spark, target_files=1, stats_col="k")  # integral: fine


def test_expire_preserves_fileless_partition_lineage(spark, tmp_path):
    """ADVICE r4: committed_partitions() must not shrink after
    expire_snapshots even when some lineage records carry no file (empty
    partitions / metrics-only records)."""
    from langtoolsosm_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    # commit 1: one real file + one file-less (empty-partition) record
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    fn = t.new_data_file(1)
    pq.write_table(pa.table({"k": [1, 2]}), os.path.join(t.data_dir, fn))
    t.commit(
        files=[fn],
        lineage=[
            {"partition_id": 1, "rows": 2, "duration_ms": 1, "file": fn},
            {"partition_id": 7, "rows": 0, "duration_ms": 0},
        ],
    )
    fn2 = t.new_data_file(2)
    pq.write_table(pa.table({"k": [3]}), os.path.join(t.data_dir, fn2))
    t.commit(files=[fn2], lineage=[{"partition_id": 2, "rows": 1, "duration_ms": 1, "file": fn2}])
    before = t.committed_partitions()
    assert before == {1, 2, 7}
    t.expire_snapshots(keep_last=1)
    assert t.committed_partitions() == before
    assert t.current()["total_rows"] == 3


def test_observed_metric_bounded_wait():
    """ADVICE r4: a build that never posts Observation metrics must raise
    after the timeout instead of hanging dedup_clusters forever."""
    import time

    from langtoolsosm_spark.operators.dedup import _observed_metric

    class HangingObs:
        @property
        def get(self):
            time.sleep(30)
            return {"changed": 0}

    t0 = time.time()
    with pytest.raises(RuntimeError, match="observed metrics"):
        _observed_metric(HangingObs(), "changed", timeout_s=0.5)
    assert time.time() - t0 < 5

    class GoodObs:
        @property
        def get(self):
            return {"changed": 4}

    assert _observed_metric(GoodObs(), "changed", timeout_s=5) == 4


def test_pip_unique_owner_allows_map_columns(spark):
    """unique=True must work when points carry non-orderable columns
    (map<string,string> tags — the core OSM shape): min() runs on
    polygon_id alone; other columns ride along via first()."""
    import pandas as pd
    from pyspark.sql import functions as F

    from langtoolsosm_spark.operators.pip_join import pip_join

    pts = spark.createDataFrame(
        [(1, 37.0, -1.0), (2, 37.5, 0.0), (3, 10.0, 10.0)],
        "image_id long, lat double, lon double",
    ).withColumn("tags", F.create_map(F.lit("k"), F.lit("v")))
    polys = spark.createDataFrame(
        [
            ("B", [{"lat": 36.0, "lon": -3.0}, {"lat": 36.0, "lon": 1.0},
                   {"lat": 39.0, "lon": 1.0}, {"lat": 39.0, "lon": -3.0}]),
            ("A", [{"lat": 36.0, "lon": -3.0}, {"lat": 36.0, "lon": 1.0},
                   {"lat": 39.0, "lon": 1.0}, {"lat": 39.0, "lon": -3.0}]),
        ],
        "polygon_id string, ring array<struct<lat:double,lon:double>>",
    )
    out = pip_join(pts, polys, res=6, unique=True).toPandas()
    # both points in the overlap resolve to the lexicographically
    # smallest owner, map column preserved
    assert sorted(out["image_id"]) == [1, 2]
    assert set(out["polygon_id"]) == {"A"}
    assert all(t == {"k": "v"} for t in out["tags"])


def test_hierarchical_cover_bounds_area_blowup(spark):
    """The hierarchical cover must classify identically to the flat fine
    mesh (cell-local tests) while staying O(area + perimeter*2^L) in
    size — the flat mesh is O(area*4^L) and blows up for big polygons."""
    import numpy as np
    import pandas as pd

    from langtoolsosm_spark.operators.pip_join import _cover_pdf, _cover_pdf_hier

    ring = [{"lat": 30.0, "lon": -10.0}, {"lat": 30.0, "lon": 10.0},
            {"lat": 50.0, "lon": 10.0}, {"lat": 50.0, "lon": -10.0}]
    pdf = pd.DataFrame({"polygon_id": ["BIG"], "ring": [ring]})
    flat = _cover_pdf(pdf, 11)
    hier = _cover_pdf_hier(pdf, 8, 11)
    assert len(hier) < len(flat) / 10

    # semantic equivalence at the fine level: the hier band's fine cells
    # must classify exactly as the same cells do in the flat mesh
    fine = hier[hier["fine"]]
    flat_map = dict(zip(flat["tile"], flat["full_inside"]))
    for t, fi in zip(fine["tile"], fine["full_inside"]):
        assert flat_map[t] == fi
    # and every flat boundary cell is present among the hier fine cells
    flat_band = set(flat[~flat["full_inside"]]["tile"])
    assert flat_band <= set(fine["tile"])


def test_hilbert_compaction_beats_zorder_regions(spark, tmp_path):
    """curve='hilbert' compaction: every output file's (x, y) cell set is
    an edge-CONNECTED region (a contiguous Hilbert interval always is —
    Z-order intervals straddle seams), the summed per-file bbox area is
    strictly smaller than the Z-order layout's on the same input, and
    content + range pruning behave identically."""
    import os

    import pyarrow.parquet as pq

    from langtoolsosm_spark.sources.snapshots import (
        SnapshotTable,
        compact_table,
        write_partitioned,
    )

    def build(curve, root):
        df = spark.range(0, 4096).select(
            F.col("id").alias("row_id"),
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            (F.col("id") % 97).alias("pbucket"),
        )
        t = SnapshotTable(str(root))
        write_partitioned(df, t, "pbucket", stats_col="x")
        # 6 files: NOT a power of two, so curve intervals are misaligned
        # with quadrant blocks — the case where the curves differ
        compact_table(t, spark, target_files=6, zorder_cols=("x", "y"), curve=curve)
        return t

    def regions(t):
        area, conn = 0, []
        for fn in t.live_files():
            pdf = pq.read_table(
                os.path.join(t.data_dir, fn), columns=["x", "y"]
            ).to_pandas()
            xs, ys = pdf["x"].to_numpy(), pdf["y"].to_numpy()
            area += int(
                (xs.max() - xs.min() + 1) * (ys.max() - ys.min() + 1)
            )
            cells = set(zip(xs.tolist(), ys.tolist()))
            start = next(iter(cells))
            seen, stack = {start}, [start]
            while stack:
                cx, cy = stack.pop()
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nb = (cx + dx, cy + dy)
                    if nb in cells and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            conn.append(len(seen) == len(cells))
        return area, conn

    tz = build("zorder", tmp_path / "z")
    th = build("hilbert", tmp_path / "h")
    az, _ = regions(tz)
    ah, conn_h = regions(th)
    assert all(conn_h), "a Hilbert interval must be an edge-connected region"
    assert ah < az, f"hilbert bbox area {ah} not tighter than zorder {az}"
    assert th.read(spark).count() == 4096
    assert sorted(r.row_id for r in th.read_range(spark, "x", 0, 7).collect()) == sorted(
        r.row_id for r in tz.read_range(spark, "x", 0, 7).collect()
    )
    with pytest.raises(ValueError):
        compact_table(th, spark, target_files=2, zorder_cols=("x", "y"), curve="peano")


def test_distinctive_terms_integer_ranking(spark):
    """'zebra' (df=1) must outrank common terms; ties break by term; k
    bounds output."""
    from langtoolsosm_spark.operators.textstats import distinctive_terms

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat and the dog saw a zebra",
                    "the cat and the dog",
                    "the dog barks",
                ],
            }
        )
    )
    got = distinctive_terms(docs, k=2).toPandas()
    d1 = got[got.doc_id == 1].sort_values("rnk")
    # 'a', 'saw', 'zebra' all tf=1 df=1 -> 1e6 (beating the: tf=2 df=3
    # -> 666666); the tie breaks term-ascending so k=2 keeps a, saw
    assert list(d1["term"]) == ["a", "saw"]
    assert (d1["score"] == 1_000_000).all()
    d3 = got[got.doc_id == 3].sort_values("rnk")
    assert d3.iloc[0]["term"] == "barks"  # df=1 beats dog/the
    assert (got.groupby("doc_id").size() <= 2).all()
    with pytest.raises(ValueError):
        distinctive_terms(docs, k=0)


def test_vocab_growth_monotone_and_exact(spark):
    """4 docs, 2 steps: prefix vocab/token counts match hand counts and
    the curve is monotone; empty-token docs still advance the prefix."""
    from langtoolsosm_spark.operators.textstats import vocab_growth

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b a", "b c", "123 !!", "d"],
            }
        )
    )
    got = {r["step"]: r for r in vocab_growth(docs, steps=2).collect()}
    # step 1: docs 1-2 -> tokens 5, vocab {a,b,c}=3; step 2: all -> 6, 4
    assert (got[1]["n_docs"], got[1]["total_tokens"], got[1]["vocab"]) == (2, 5, 3)
    assert (got[2]["n_docs"], got[2]["total_tokens"], got[2]["vocab"]) == (4, 6, 4)
    assert got[2]["boundary_id"] == 4
    with pytest.raises(ValueError):
        vocab_growth(docs, steps=0)


def test_cli_entry_point_query_job(spark, tmp_path):
    """python -m langtoolsosm_spark --job query runs a registry query
    in-process and writes parquet (the spark-submit surface)."""
    from langtoolsosm_spark.__main__ import main

    out = str(tmp_path / "q")
    rc = main([
        "--job", "query", "--name", "tile_assign",
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
    ])
    assert rc == 0
    assert spark.read.parquet(out).count() > 0
    assert main(["--job", "query", "--name", "nope",
                 "--sf-dir", "x", "--out", out]) == 2


def test_merge_tile_histogram_incremental_equals_recompute(spark):
    """Signed-delta merge equals full recompute; a fully-deleted tile
    drops out of the rollup."""
    from langtoolsosm_spark.operators.tiling import (
        assign_tiles,
        cell_histogram,
        merge_tile_histogram,
    )

    base_pts = spark.createDataFrame(
        pd.DataFrame({"lat": [10.0, 10.0, -40.0], "lon": [10.0, 10.01, 100.0]})
    )
    base = cell_histogram(assign_tiles(base_pts, res=4), "tile")
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "lat": [50.0, -40.0],
                "lon": [50.0, 100.0],
                "sign": [1, -1],  # insert a new tile; delete the singleton
            }
        )
    )
    got = {r["tile"]: r["n_rows"] for r in
           merge_tile_histogram(base, delta, res=4).collect()}
    want_pts = spark.createDataFrame(
        pd.DataFrame({"lat": [10.0, 10.0, 50.0], "lon": [10.0, 10.01, 50.0]})
    )
    want = {r["tile"]: r["n_rows"] for r in
            cell_histogram(assign_tiles(want_pts, res=4), "tile").collect()}
    assert got == want and len(got) == 2

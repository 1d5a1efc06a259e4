"""Round-4 regression tests: LSH bucket-kernel parity + dim-independent
planning, sharded exact-top-k parity, typed-empty range reads, single-
action-per-round connected components, and the modular wrap-distance
invariant for annulus explodes beyond the grid size."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _analyzed_plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _synth_emb(spark, n: int = 200, dim: int = 16, seed: int = 7):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [r.tolist() for r in v]}
    )
    return spark.createDataFrame(pdf)


def test_lsh_bucket_kernel_matches_expression_form(spark):
    """sign_lsh_buckets_kernel (broadcast ±1 matrix + mapInPandas) must be
    bit-identical to the expression form at a non-default dim — the
    expression form is the DuckDB oracle spec, the kernel is the
    high-dim scale path."""
    from langtoolsosm_spark.operators.similarity import (
        sign_lsh_buckets,
        sign_lsh_buckets_kernel,
    )

    emb = _synth_emb(spark, n=150, dim=16)
    expr = (
        sign_lsh_buckets(emb, n_tables=3, n_bits=5, dim=16)
        .select("vec_id", "table", "bucket")
        .toPandas()
        .sort_values(["vec_id", "table"])
        .reset_index(drop=True)
    )
    kern = (
        sign_lsh_buckets_kernel(emb, n_tables=3, n_bits=5, dim=16)
        .toPandas()
        .sort_values(["vec_id", "table"])
        .reset_index(drop=True)
    )
    assert len(expr) == len(kern) == 150 * 3
    assert (expr["bucket"].to_numpy() == kern["bucket"].to_numpy()).all()
    assert (expr["table"].to_numpy() == kern["table"].to_numpy()).all()


def test_lsh_bucket_kernel_plan_constant_in_dim(spark):
    """The kernel's plan must not grow with the embedding dimension (the
    expression form carries n_tables*n_bits*dim sign literals — a
    Catalyst planning bottleneck at real dims). dim=1024 and dim=16
    plans should be the same handful of nodes."""
    from langtoolsosm_spark.operators.similarity import sign_lsh_buckets_kernel

    lo = _synth_emb(spark, n=4, dim=16)
    hi = _synth_emb(spark, n=4, dim=1024)
    p_lo = _analyzed_plan(sign_lsh_buckets_kernel(lo, dim=16))
    p_hi = _analyzed_plan(sign_lsh_buckets_kernel(hi, dim=1024))
    assert len(p_hi) < 4000, f"kernel plan grew with dim: {len(p_hi)} chars"
    assert len(p_hi) < 2 * len(p_lo) + 500


def test_topk_kernel_sharded_matches_single_broadcast(spark):
    """Forcing the id-sharded multi-broadcast path (tiny shard_rows) with
    an EXPLICIT query frame must give byte-identical results to the
    single-broadcast path — shards partition the query set, each shard's
    answer is exact."""
    from langtoolsosm_spark.operators.similarity import topk_dot_kernel

    emb = _synth_emb(spark, n=300, dim=8, seed=11)
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    one = (
        topk_dot_kernel(emb, queries=queries, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    sharded = (
        topk_dot_kernel(emb, queries=queries, k=3, shard_rows=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(one) > 0
    pd.testing.assert_frame_equal(one, sharded)


def test_read_range_empty_overlap_returns_typed_empty(spark, tmp_path):
    """A range between key values is 'no rows', not 'missing table': the
    read must come back empty WITH the table schema; only a table with
    no live files raises."""
    from langtoolsosm_spark.sources.snapshots import SnapshotTable, write_partitioned

    df = spark.range(0, 400).select(
        F.col("id").alias("row_id"), (F.col("id") % 8).alias("tile")
    )
    table = SnapshotTable(str(tmp_path / "snap"))
    write_partitioned(df, table, "tile", stats_col="tile")

    got = table.read_range(spark, "tile", 100, 200)
    assert got.count() == 0
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]

    empty = SnapshotTable(str(tmp_path / "never_written"))
    with pytest.raises(FileNotFoundError):
        empty.read_range(spark, "tile", 0, 1)


def test_dedup_clusters_validates_max_iter(spark):
    from langtoolsosm_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_iter"):
        dedup_clusters(pairs, max_iter=0)


def test_dedup_clusters_no_separate_count_action(spark, monkeypatch):
    """The convergence count must ride the checkpoint job (Observation),
    not run as a separate count() action per round (job-count itself is
    not a stable proxy — AQE splits one action into several jobs — so
    assert the count() path is gone outright)."""
    from pyspark.sql import DataFrame

    from langtoolsosm_spark.operators.dedup import dedup_clusters

    calls = []
    orig = DataFrame.count
    monkeypatch.setattr(DataFrame, "count", lambda self: (calls.append(1), orig(self))[1])
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = dedup_clusters(pairs, max_iter=5)
    assert not calls, f"dedup_clusters ran {len(calls)} separate count() actions"
    got = {(r.doc_id, r.cluster_id) for r in out.collect()}
    assert got == {(1, 1), (2, 1)}


def test_annulus_disjoint_near_grid_edge_and_overflow_rejected(spark):
    """ADVICE r3 / VERDICT r4: the wrap-aware annulus must stay disjoint
    from the previous disk and emit each (feature, cell) once up to the
    full-disk radius n-1; a radius >= n (where the annulus contract is
    provably vacuous — the radius-(n-1) disk already covers the grid) is
    now an enforced ValueError instead of an incidental no-op, and
    knn_join clamps its schedule accordingly."""
    import pytest

    from langtoolsosm_spark.operators.knn import _explode_feature_disk

    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [0, 1, 2],
                "__flat": [10.0, -40.0, 80.0],
                "__flon": [0.0, 170.0, -90.0],
            }
        )
    )
    res = 2  # n = 4: radius 3 is the full-disk maximum
    disk = _explode_feature_disk(feats, res, radius=2, min_radius=-1)
    ring = _explode_feature_disk(feats, res, radius=3, min_radius=2)
    d = {(r[0], r[1]) for r in disk.select("fid", "__cell").collect()}
    rg = [(r[0], r[1]) for r in ring.select("fid", "__cell").collect()]
    assert len(rg) == len(set(rg)), "duplicate (feature, cell) in annulus"
    assert not d.intersection(rg), "annulus re-emitted previous-disk cells"
    # full disk covers all occupied-feature cells x the whole grid
    full = {(r[0], r[1]) for r in
            _explode_feature_disk(feats, res, radius=3, min_radius=-1)
            .select("fid", "__cell").collect()}
    assert full == {(f, c) for f in (0, 1, 2) for c in range(16)}
    for bad in (4, 9):
        with pytest.raises(ValueError, match="grid size"):
            _explode_feature_disk(feats, res, radius=bad)


def test_ngram_repetition_stays_jvm_and_shuffle_free(spark):
    """The repetition filter is per-row column arithmetic: zero Python
    eval nodes, zero exchanges, and exact values on a known doc."""
    from langtoolsosm_spark.operators.textstats import ngram_repetition

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "a b a b a b",      # 4 trigrams, 2 distinct -> 500
                    "x y z w",           # 2 trigrams, 2 distinct -> 0
                    "only two",          # < 3 tokens -> all zeros
                ],
            }
        )
    )
    out = ngram_repetition(docs).toPandas().set_index("doc_id")
    assert out.loc[1].tolist() == [4, 2, 500]
    assert out.loc[2].tolist() == [2, 2, 0]
    assert out.loc[3].tolist() == [0, 0, 0]
    plan = ngram_repetition(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_compact_preserves_content_and_tightens_pruning(spark, tmp_path):
    """Compaction must fold many small files into target_files larger
    ones, preserve content exactly, keep old files readable via time
    travel, and (range-clustered on the stats column) prune at least as
    well as before."""
    from langtoolsosm_spark.sources.snapshots import (
        SnapshotTable,
        compact_table,
        write_partitioned,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("row_id"), (F.col("id") % 16).alias("tile")
    )
    table = SnapshotTable(str(tmp_path / "snap"))
    write_partitioned(df, table, "tile", stats_col="tile")
    pre_files = table.live_files()
    pre_sid = table.current()["snapshot_id"]
    assert len(pre_files) == 16

    snap = compact_table(table, spark, target_files=4, stats_col="tile")
    assert snap["operation"] == "overwrite"
    post_files = table.live_files()
    assert 1 <= len(post_files) <= 4

    want = sorted((r.row_id, r.tile) for r in df.collect())
    got = sorted((r.row_id, r.tile) for r in table.read(spark).collect())
    assert got == want
    # time travel to the pre-compaction snapshot still sees the old state
    old = sorted((r.row_id, r.tile) for r in table.read(spark, pre_sid).collect())
    assert old == want

    # range-clustered rewrite: a narrow range opens a strict subset
    pruned = table.pruned_files("tile", 3, 5)
    assert len(pruned) < len(post_files) or len(post_files) == 1
    got_rng = table.read_range(spark, "tile", 3, 5)
    assert got_rng.count() == df.filter(F.col("tile").between(3, 5)).count()


def test_expire_snapshots_reclaims_orphans_keeps_state(spark, tmp_path):
    """Expiration after compaction must delete the pre-compaction data
    files and manifests, keep the current content byte-identical, keep
    manifest-stats pruning working, and preserve committed_partitions
    resume bookkeeping across the rewrite."""
    import os

    from langtoolsosm_spark.sources.snapshots import (
        SnapshotTable,
        compact_table,
        write_partitioned,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("row_id"), (F.col("id") % 8).alias("tile")
    )
    table = SnapshotTable(str(tmp_path / "snap"))
    write_partitioned(df, table, "tile", stats_col="tile", batch_partitions=4)
    assert len(table.snapshots()) == 2  # two batched commits
    pre_committed = table.committed_partitions()

    # expire with NO overwrite in between: earliest retained snapshot is
    # rewritten self-contained, resume set and content must survive
    res = table.expire_snapshots(keep_last=1)
    assert res["removed_snapshots"] == 1
    assert res["deleted_files"] == 0  # append chain: every file still live
    want = sorted((r.row_id, r.tile) for r in df.collect())
    assert sorted((r.row_id, r.tile) for r in table.read(spark).collect()) == want
    assert table.committed_partitions() == pre_committed

    old_files = {os.path.basename(p) for p in table.live_files()}
    compact_table(table, spark, target_files=2, stats_col="tile")
    res2 = table.expire_snapshots(keep_last=1)
    assert res2["deleted_files"] == len(old_files) == 8
    assert len(table.snapshots()) == 1
    assert sorted((r.row_id, r.tile) for r in table.read(spark).collect()) == want
    pruned = table.pruned_files("tile", 0, 2)
    assert len(pruned) <= len(table.live_files())
    assert table.read_range(spark, "tile", 0, 2).count() == df.filter(
        F.col("tile") <= 2
    ).count()


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """Z-order compaction must leave per-file stats that prune narrow
    ranges on BOTH interleaved columns (a single-column range cluster
    can only ever prune one), while preserving content exactly."""
    from langtoolsosm_spark.sources.snapshots import (
        SnapshotTable,
        compact_table,
        write_partitioned,
    )

    df = spark.range(0, 1024).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
        # 97 scattered initial partitions: stride-97 row groups hit
        # near-random (x, y) cells, so the pre-compaction layout is
        # clustered on NOTHING useful — same setup as hashing every row
        # to its own file (the original fixture) at 1/40th the file count
        (F.col("id") % 97).alias("pbucket"),
    )
    table = SnapshotTable(str(tmp_path / "snap"))
    write_partitioned(df, table, "pbucket", stats_col="x")
    compact_table(table, spark, target_files=16, zorder_cols=("x", "y"))
    files = table.live_files()
    assert len(files) <= 16

    want = sorted((r.row_id, r.x, r.y) for r in df.collect())
    got = sorted((r.row_id, r.x, r.y) for r in table.read(spark).collect())
    assert got == want

    px = table.pruned_files("x", 0, 7)
    py = table.pruned_files("y", 0, 7)
    assert len(px) < len(files), "x-range pruning ineffective after z-order"
    assert len(py) < len(files), "y-range pruning ineffective after z-order"
    assert table.read_range(spark, "x", 0, 7).count() == 8 * 32
    assert table.read_range(spark, "y", 0, 7).count() == 8 * 32


def test_chunk_documents_stride_and_tail(spark):
    """Chunk boundaries: 64-token chunks with stride 48; a 100-token doc
    yields chunks [0,64) and [48,100) (52 tokens); a short doc yields
    one full-copy chunk; invalid overlap raises."""
    from langtoolsosm_spark.operators.textstats import chunk_documents

    long_doc = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [long_doc, "a b c"]})
    )
    out = chunk_documents(docs).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    assert d1.n_tokens.tolist() == [64, 52]
    assert d1.iloc[0].chunk_text.split(" ")[0] == "w0"
    assert d1.iloc[1].chunk_text.split(" ")[0] == "w48"
    assert d1.iloc[1].chunk_text.split(" ")[-1] == "w99"
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk_text == "a b c"
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_tile_pyramid_single_scan_single_shuffle(spark):
    """The pyramid rollup must read the source once (9 per-level groupBys
    would re-scan 9 times) with no Python nodes. Since round 5 it
    pre-aggregates at max_res BEFORE the level explode (VERDICT r4), so
    the plan has one Generate over the tiny histogram and at most two
    aggregate Exchanges — the second carries only O(4^max_res) partials,
    never fact rows (shape asserted in test_plan_quality)."""
    from langtoolsosm_spark.operators.tiling import tile_pyramid

    pts = spark.createDataFrame(
        pd.DataFrame({"lat": [10.0, -40.0, 80.0], "lon": [0.0, 170.0, -90.0]})
    )
    df = tile_pyramid(pts, max_res=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
    assert plan.count("Exchange") <= 2
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    out = df.toPandas()
    # level 0 has one world tile holding all rows
    assert out[out.res == 0].n_rows.tolist() == [3]
    assert (out.groupby("res").n_rows.sum() == 3).all()

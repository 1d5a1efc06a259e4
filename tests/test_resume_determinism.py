"""Kill-resume + determinism-under-parallelism tests (SURVEY.md §5.5)."""

import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.plans.pipeline import flagship, run_to_snapshot
from langtoolsosm_spark.sources.snapshots import SnapshotTable


def _content_hash(df):
    return (
        df.select(
            F.md5(
                F.concat_ws("\x01", "image_id", "tile", "polygon_id", "caption_enriched")
            ).alias("h")
        )
        .agg(
            F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s")
        )
        .collect()[0]["s"]
    )


def test_interrupted_run_resumes_to_identical_table(spark, synth_dir, tmp_path):
    """Simulate a crash after a partial commit: a fresh full run over a
    table that already holds some committed partitions must skip them and
    converge to the same final content."""
    full_path = str(tmp_path / "full")
    m1 = run_to_snapshot(spark, synth_dir, full_path, res=8, with_knn=False, resume=False)
    full_table = SnapshotTable(full_path)
    full_hash = _content_hash(full_table.read(spark))
    n_rows = m1["rows"]

    # build a "crashed" table containing only the first snapshot's files
    import json
    import os
    import shutil

    crash_path = str(tmp_path / "crash")
    snaps = full_table.snapshots()
    first = snaps[0]
    partial_files = first["files"][: max(1, len(first["files"]) // 2)]
    partial_lineage = [
        r for r in first["lineage"]
        if any(f.startswith(f"part-{r['partition_id']:05d}-") for f in partial_files)
    ]
    crash_table = SnapshotTable(crash_path)
    for f in partial_files:
        shutil.copy(os.path.join(full_table.data_dir, f), os.path.join(crash_table.data_dir, f))
    crash_table.commit(files=partial_files, lineage=partial_lineage, summary={"comment": "partial"})
    n_committed = len(crash_table.committed_partitions())
    assert 0 < n_committed

    # resume: full job again with resume=True -> writes only missing parts
    m2 = run_to_snapshot(spark, synth_dir, crash_path, res=8, with_knn=False, resume=True)
    assert m2["skipped_partitions"] == n_committed
    resumed = SnapshotTable(crash_path).read(spark)
    assert resumed.count() == n_rows
    assert _content_hash(resumed) == full_hash


def test_dry_run_writes_nothing_and_releases_caches(spark, synth_dir, tmp_path):
    """--dry-run parity: full plan evaluated, metrics returned, zero files
    on disk, and every persist() taken by the run released (the Spark
    cache manager is empty afterwards; the kNN localCheckpoint holds only
    the small result rows, not plan caches)."""
    import os

    out = str(tmp_path / "dry_out")
    m = run_to_snapshot(spark, synth_dir, out, res=8, with_knn=True, dry_run=True)
    assert m["dry_run"] is True
    assert m["rows"] > 0
    assert m["snapshots"] == []
    assert not os.path.exists(out)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    # a real run over the same inputs matches the dry-run's row count
    m2 = run_to_snapshot(spark, synth_dir, out, res=8, with_knn=True, resume=False)
    assert m2["rows"] == m["rows"]
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_new_operators_invariant_under_shuffle_partitioning(spark):
    """asof/interval/salted-join/quantile outputs must be identical at any
    shuffle parallelism (deterministic tie-breaks; no partition-dependent
    arithmetic)."""
    from langtoolsosm_spark.plans.driver_queries import (
        q_asof_join,
        q_interval_join,
        q_quantile_estimate,
        q_salted_join,
    )

    def snap(parts: str):
        cur = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            out = {}
            for name, q in [
                ("asof", q_asof_join), ("interval", q_interval_join),
                ("salted", q_salted_join), ("quantile", q_quantile_estimate),
            ]:
                pdf = q(spark, "/root/testdata/sf0.001").toPandas()
                out[name] = sorted(map(tuple, pdf.fillna(-1).to_numpy().tolist()))
            return out
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", cur)

    a = snap("3")
    b = snap("19")
    for name in a:
        assert a[name] == b[name], name


def test_output_invariant_under_shuffle_partitioning(spark, synth_dir):
    """Same plan, different shuffle parallelism -> identical content
    (deterministic tie-breaks everywhere, SURVEY.md §7.3)."""
    cur = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h3 = _content_hash(flagship(spark, synth_dir, res=8, with_knn=True))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        h17 = _content_hash(flagship(spark, synth_dir, res=8, with_knn=True))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)
    assert h3 == h17

"""Structured Streaming: windowed agg parity with batch + exactly-once
snapshot ingest with checkpoint resume (SURVEY.md §2.9, §5 item 5)."""

import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.operators.tiling import assign_tiles
from langtoolsosm_spark.streaming import microbatch as mb


@pytest.fixture()
def images_dir(synth_dir, tmp_path):
    """File-stream sources need a directory; stage the table as one."""
    import os

    d = tmp_path / "images_stream"
    d.mkdir()
    os.symlink(f"{synth_dir}/images.parquet", d / "part-0.parquet")
    return str(d)


def test_stream_counts_match_batch(spark, images_dir, tmp_path):
    got = mb.run_tile_counts_once(
        spark, images_dir, str(tmp_path / "ckpt"), res=6
    ).toPandas()
    batch = (
        assign_tiles(spark.read.parquet(images_dir), res=6)
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .toPandas()
    )
    g = got.sort_values("tile").reset_index(drop=True)
    b = batch.sort_values("tile").reset_index(drop=True)
    assert g.equals(b)


def test_stateful_tile_distinct_matches_batch_sketch(spark, synth_dir, tmp_path):
    """applyInPandasWithState running distinct counter: state (256-byte HLL
    registers per tile) must carry across micro-batches, so after streaming
    the data as THREE single-file triggers, the per-tile estimate equals
    the batch sketch computed over the whole table in one pass."""
    import numpy as np

    from langtoolsosm_spark.operators.sketches import estimate_from_registers, hll_reg_rho

    # stage the table as 3 parquet files -> 3 triggers (maxFilesPerTrigger=1)
    src = spark.read.parquet(f"{synth_dir}/images.parquet").select(
        "image_id", "lat", "lon"
    )
    d = tmp_path / "img3"
    d.mkdir()
    pdf = src.toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(pdf)
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i * n // 3 : (i + 1) * n // 3], preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )

    got = mb.run_tile_distinct_once(spark, str(d), str(tmp_path / "ckpt_sd"), res=4)
    got_pdf = got.toPandas().set_index("tile").sort_index()

    # batch reference: dense register vector per tile over the full table
    reg, rho = hll_reg_rho("image_id")
    from langtoolsosm_spark.operators.tiling import assign_tiles

    batch = (
        assign_tiles(src, res=4)
        .select("tile", reg.alias("r"), rho.alias("p"))
        .groupBy("tile", "r")
        .agg(F.max("p").alias("p"))
        .toPandas()
    )
    for tile, grp in batch.groupby("tile"):
        dense = np.zeros(256, dtype=np.int64)
        dense[grp["r"].to_numpy()] = grp["p"].to_numpy()
        assert got_pdf.loc[tile, "est_milli"] == estimate_from_registers(dense)
    assert int(got_pdf["total_rows"].sum()) == n


def test_stream_epochs_never_collect_to_driver(spark, images_dir, tmp_path, monkeypatch):
    """The streaming sink must write epoch data executor-side: any bulk
    driver-side materialization (toPandas on the epoch frame) fails this
    test. (The snapshot writer's manifest collect — a handful of
    bookkeeping rows — is the legitimate exception and stays allowed.)"""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("epoch DataFrame materialized on the driver")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    table = mb.stream_to_snapshots(
        spark, images_dir, str(tmp_path / "tbl_nd"), str(tmp_path / "ck_nd"), res=6
    )
    monkeypatch.undo()
    n_total = spark.read.parquet(images_dir).count()
    assert table.read(spark).count() == n_total


def test_stream_snapshot_ingest_exactly_once(spark, images_dir, tmp_path):
    table = mb.stream_to_snapshots(
        spark, images_dir, str(tmp_path / "tbl"), str(tmp_path / "ck"), res=6
    )
    n_total = spark.read.parquet(images_dir).count()
    assert table.read(spark).count() == n_total
    n_snaps = len(table.snapshots())
    assert n_snaps >= 1
    # resume from the same checkpoint: no new data -> no new snapshots
    table2 = mb.stream_to_snapshots(
        spark, images_dir, str(tmp_path / "tbl"), str(tmp_path / "ck"), res=6
    )
    assert len(table2.snapshots()) == n_snaps
    assert table2.read(spark).count() == n_total

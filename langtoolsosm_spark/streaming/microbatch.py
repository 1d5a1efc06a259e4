"""Streaming ingest: Structured Streaming sources feeding the same
snapshot/lineage layer as batch (SURVEY.md §2.9).

The reference is strictly batch; its only stream-like behavior is bounded
transactional micro-batching of changesets
(/root/reference/src/fill_empty_name.py:66-79). The engine mirrors that
as (a) deterministic batch-with-checkpoint commits (sources/snapshots.py)
and (b) real Structured Streaming for continuous ingest: files ->
transformations -> ``foreachBatch`` snapshot commits keyed by epoch id, so
replayed epochs after a crash are idempotent (exactly-once sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.tiling import assign_tiles
from ..sources.snapshots import SnapshotTable


def stream_images(spark: SparkSession, images_dir: str, schema=None) -> DataFrame:
    """File-source stream over an images directory (parquet)."""
    if schema is None:
        schema = spark.read.parquet(images_dir).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 4)
        .load(images_dir)
    )


def stream_tile_counts(stream: DataFrame, res: int = 6) -> DataFrame:
    """Continuous per-tile counts (stateful aggregation, complete mode)."""
    return assign_tiles(stream, res=res).groupBy("tile").agg(
        F.count(F.lit(1)).alias("n_images")
    )


def run_tile_counts_once(
    spark: SparkSession, images_dir: str, checkpoint: str, res: int = 6
) -> DataFrame:
    """Drive the streaming agg to completion on available data (memory
    sink, availableNow trigger) and return the result table."""
    q = (
        stream_tile_counts(stream_images(spark, images_dir), res=res)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tile_counts_stream")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT tile, n_images FROM tile_counts_stream")


def stream_to_snapshots(
    spark: SparkSession,
    images_dir: str,
    table_path: str,
    checkpoint: str,
    res: int = 8,
) -> SnapshotTable:
    """Streaming ingest -> tile assignment -> snapshot commit per epoch.

    ``foreachBatch`` + epoch-keyed summaries give exactly-once commits:
    on restart from the checkpoint, an already-committed epoch id is
    skipped (idempotent sink), mirroring batch resume semantics.
    """
    from ..sources.snapshots import write_partitioned

    table = SnapshotTable(table_path)

    def commit_batch(df: DataFrame, epoch_id: int) -> None:
        done = {
            s["summary"].get("epoch") for s in table.snapshots()
        }
        if epoch_id in done:
            return
        # executor-side data path: the epoch flows through the same
        # distributed snapshot writer as batch (applyInPandas per tile
        # partition); only manifest bookkeeping touches the driver. The
        # round-1 implementation collected every epoch to the driver with
        # toPandas() — a non-starter for continuous ingest at scale.
        write_partitioned(
            assign_tiles(df, res=res),
            table,
            "tile",
            summary={"comment": "stream ingest", "epoch": int(epoch_id)},
        )

    q = (
        stream_images(spark, images_dir)
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table

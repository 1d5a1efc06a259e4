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


def stream_images(
    spark: SparkSession, images_dir: str, schema=None, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over an images directory (parquet)."""
    if schema is None:
        schema = spark.read.parquet(images_dir).schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
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


def stream_windowed_counts(
    stream: DataFrame,
    window_dur: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts (SURVEY.md §2.9 late-data path):
    events later than ``watermark`` behind the observed max event time are
    dropped; windows finalize (append-mode emit) once the watermark passes
    their end. State is bounded by (windows within watermark x keys)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def run_windowed_counts_once(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    out_dir: str,
    window_dur: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive the watermarked agg over available files (append mode: only
    windows the watermark has passed are emitted) into a parquet file sink
    — the memory sink can't recover a checkpoint, the file sink can, so
    repeated runs continue the same watermark — and return all rows
    emitted so far."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
        # NTZ parquet timestamps are not a valid event-time column
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_windowed_counts(stream, window_dur, watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        "win_start timestamp, win_end timestamp, event_type string, n long"
    ).parquet(out_dir)


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes its last-seen event time, so state is
    (keys within the watermark horizon), not (all keys ever) — the
    difference between a dedup stream that runs forever at 100 TB/day
    and one that OOMs. Duplicates arriving within the watermark window
    of the first occurrence are dropped; the first row per key wins
    (same keep-first contract as the batch ``dedup_exact`` family)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_dedup_exact_once(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    out_dir: str,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive the streaming dedup over available files into a parquet sink
    (append mode; checkpoint-recoverable) and return everything emitted
    so far."""
    schema = spark.read.parquet(events_dir).schema
    keys = key_cols or ["user_id", "event_type"]
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_dedup_exact(stream, keys, "ts", watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def stream_tile_distinct(stream: DataFrame, res: int = 6, id_col: str = "image_id") -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.9 /
    applyInPandasWithState): per-tile RUNNING approximate-distinct counter
    with BOUNDED state — each tile's state is its 256-byte HLL register
    vector plus a row counter, regardless of how many ids ever stream
    through (an exact running dedup would grow state without bound).

    Registers/rho are computed JVM-side (operators/sketches.py:hll_reg_rho
    — md5 + integer ops, no Python hashing); the stateful kernel only
    merges them with a vectorized ``np.maximum.at``. Emits one update row
    per (tile, trigger): (tile, batch_rows, total_rows, est_milli). The
    register merge is max(), so the final streaming state is IDENTICAL to
    the batch sketch over the union of all micro-batches (tested).
    """
    import numpy as np
    import pandas as pd

    from ..operators.sketches import M, estimate_from_registers, hll_reg_rho

    reg, rho = hll_reg_rho(id_col)
    keyed = assign_tiles(stream, res=res).select(
        "tile", reg.alias("__reg"), rho.alias("__rho")
    )

    def kernel(key, pdf_iter, state):
        regs = np.zeros(M, dtype=np.uint8)
        total = 0
        if state.exists:
            regs_b, total = state.get
            regs = np.frombuffer(regs_b, dtype=np.uint8).copy()
        batch_rows = 0
        for pdf in pdf_iter:
            batch_rows += len(pdf)
            np.maximum.at(
                regs,
                pdf["__reg"].to_numpy(dtype=np.int64),
                pdf["__rho"].to_numpy(dtype=np.int64).astype(np.uint8),
            )
        total = int(total) + batch_rows
        state.update((regs.tobytes(), total))
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "batch_rows": [batch_rows],
                "total_rows": [total],
                "est_milli": [estimate_from_registers(regs)],
            }
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        kernel,
        outputStructType="tile long, batch_rows long, total_rows long, est_milli long",
        stateStructType="regs binary, total long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_tile_distinct_once(
    spark: SparkSession, images_dir: str, checkpoint: str, res: int = 6
) -> DataFrame:
    """Drive the stateful distinct counter over available data (one file
    per trigger so state actually carries across micro-batches) and return
    the LATEST update per tile."""
    q = (
        stream_tile_distinct(
            stream_images(spark, images_dir, max_files_per_trigger=1).select(
                "image_id", "lat", "lon"
            ),
            res=res,
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tile_distinct_stream")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        """
        SELECT tile, total_rows, est_milli FROM (
          SELECT *, row_number() OVER (PARTITION BY tile ORDER BY total_rows DESC) AS rn
          FROM tile_distinct_stream
        ) WHERE rn = 1
        """
    )


def stream_sessionize(
    stream: DataFrame,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with EVENT-TIME TIMEOUT (the stateful
    analogue of the batch sessionize query): per key, events within
    ``gap_sec`` of each other form one session. A session is emitted ONLY
    once the watermark passes (session_end + gap) — before that, even a
    gap-closed session stays in state, because a late-but-within-watermark
    event in a later micro-batch may still fall inside it (emitting early
    would split sessions and diverge from the batch result). State per key
    is the list of not-yet-watermark-safe sessions — bounded by
    (watermark delay / gap) + 1 entries.

    Merging is symmetric: new-batch events are gap-segmented (vectorized
    np.diff), the segments and held sessions are sorted by start, and one
    sweep merges anything within ``gap_sec`` of its predecessor — so late
    events can land inside, before, between, or bridging held sessions and
    the result equals the batch sessionization of the union.

    Emits (key, start_epoch, end_epoch, n_events), one row per session
    whose (end + gap) the watermark has strictly passed.
    """
    import numpy as np
    import pandas as pd

    ws = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )

    def kernel(key, pdf_iter, state):
        held: list[tuple[int, int, int]] = []
        if state.exists:
            ss, es, ns = state.get
            held = [(int(s), int(e), int(n)) for s, e, n in zip(ss, es, ns)]
        eps = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                eps.append(
                    (pdf[ts_col].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
                )
        ep = np.sort(np.concatenate(eps)) if eps else np.array([], dtype=np.int64)
        segs: list[tuple[int, int, int]] = []
        if len(ep):
            cuts = np.flatnonzero(np.diff(ep) > gap_sec) + 1
            bounds = np.concatenate(([0], cuts, [len(ep)]))
            segs = [
                (int(ep[a]), int(ep[b - 1]), int(b - a))
                for a, b in zip(bounds[:-1], bounds[1:])
            ]
        merged: list[tuple[int, int, int]] = []
        for s, e, n in sorted(held + segs):
            if merged and s <= merged[-1][1] + gap_sec:
                ls, le, ln = merged[-1]
                merged[-1] = (ls, max(le, e), ln + n)
            else:
                merged.append((s, e, n))
        wm_ms = state.getCurrentWatermarkMs()
        closed = [
            (key[0], s, e, n) for s, e, n in merged if (e + gap_sec) * 1000 < wm_ms
        ]
        keep = [t for t in merged if (t[1] + gap_sec) * 1000 >= wm_ms]
        if keep:
            state.update(
                ([t[0] for t in keep], [t[1] for t in keep], [t[2] for t in keep])
            )
            next_close = min((e + gap_sec) * 1000 for _, e, _ in keep)
            state.setTimeoutTimestamp(max(next_close, wm_ms + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            closed, columns=[key_col, "start_epoch", "end_epoch", "n_events"]
        )

    return ws.groupBy(key_col).applyInPandasWithState(
        kernel,
        outputStructType=f"{key_col} long, start_epoch long, end_epoch long, n_events long",
        stateStructType="ss array<long>, es array<long>, ns array<long>",
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


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
            stats_col="tile",
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


def stream_pixel_histogram(
    stream: DataFrame, res: int, tile_px: int = 64,
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """Streaming density raster state: the heatmap pixel histogram
    (operators/heatmap.py) as a stateful aggregation — state is bounded
    by non-empty pixels (<= tiles * tile_px^2), each micro-batch folds
    its points in via the same map-side partials as the batch plan.
    The batch operator works unchanged on a streaming DataFrame, so this
    is the SAME code, not a parallel implementation that could drift."""
    from ..operators.heatmap import pixel_histogram

    return pixel_histogram(stream, res, tile_px, lat, lon)


def run_heatmap_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str,
    res: int, tile_px: int = 64,
) -> DataFrame:
    """Drive the streaming pixel histogram over all staged files
    (availableNow, complete mode) and roll the FINAL state up to the
    per-tile stats the batch ``heatmap_stats`` produces. Chained
    streaming aggregations are unsupported in complete mode, so the
    rollup runs batch-side over the memory sink — the streaming part is
    exactly the stateful histogram a live deployment would run; batch
    parity with ``heatmap_stats`` is the oracle contract."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    q = (
        stream_pixel_histogram(st, res=res, tile_px=tile_px)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("heatmap_stream")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from ..operators.heatmap import tile_rollup

    return tile_rollup(spark.table("heatmap_stream"))


def stream_od_transitions(
    stream: DataFrame,
    res: int = 8,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful streaming OD transition extraction (the streaming half of
    operators/spatial.py ``od_flows``): per entity, state carries the
    last seen (ts, id, tile); each micro-batch's positions — sorted by
    (ts, id) and appended after the carried position — emit one
    (entity, from_tile, to_tile) row per consecutive pair.

    Ingestion contract: event-time order ACROSS micro-batches per entity
    (time-split staged files / log-compacted Kafka partitions keyed by
    entity). An out-of-order batch RAISES rather than silently emitting
    transitions the batch job would not produce. State is one row per
    entity (no timeout here; a live deployment would add an event-time
    timeout to drop idle entities — eviction semantics identical to the
    sessionize kernel's).

    Tile assignment runs inside the Arrow kernel via the NumPy twin of
    ``tile_key_col`` (bit-identical, property-tested), so the streaming
    and batch paths share the cell math.
    """
    import numpy as np
    import pandas as pd

    from ..functions.cells import tile_key

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(
                columns=[entity_col, "from_tile", "to_tile"]
            ).astype({entity_col: "int64", "from_tile": "int64", "to_tile": "int64"})
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        ts_ns = pdf[ts_col].astype("int64").to_numpy()
        eids = pdf[id_col].astype("int64").to_numpy()
        tiles = tile_key(pdf[lat].to_numpy(), pdf[lon].to_numpy(), res)
        if state.exists:
            lts, leid, ltile = state.get
            if (ts_ns[0], eids[0]) <= (int(lts), int(leid)):
                raise ValueError(
                    f"out-of-order micro-batch for entity {key[0]}: "
                    f"batch starts at ({ts_ns[0]}, {eids[0]}) but state is "
                    f"at ({lts}, {leid}) — the ordered-ingestion contract "
                    "is broken and streaming OD would diverge from batch"
                )
            # carried position -> first new position is also a transition
            from_tiles = np.concatenate(([np.int64(ltile)], tiles[:-1]))
            tiles_out = tiles
        else:
            from_tiles = tiles[:-1]
            tiles_out = tiles[1:]
        state.update((int(ts_ns[-1]), int(eids[-1]), int(tiles[-1])))
        yield pd.DataFrame(
            {
                entity_col: np.repeat(np.int64(key[0]), len(tiles_out)),
                "from_tile": from_tiles.astype(np.int64),
                "to_tile": tiles_out.astype(np.int64),
            }
        )

    return stream.groupBy(entity_col).applyInPandasWithState(
        kernel,
        outputStructType=f"{entity_col} long, from_tile long, to_tile long",
        stateStructType="lts long, leid long, ltile long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_od_transitions_late(
    stream: DataFrame,
    res: int = 8,
    lateness_s: int = 3600,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Bounded-lateness OD transition extraction — the watermark-tolerant
    sibling of ``stream_od_transitions``. That kernel's ordered-ingestion
    contract raises on ANY cross-batch disorder; this one holds events in
    per-entity state until the entity's watermark (``max event time seen
    - lateness_s``) passes them, then emits transitions in EVENT-TIME
    order — so any arrival order within the lateness bound produces
    byte-identical output to the batch ``od_flows``. Only an event BELOW
    the already-passed watermark (disorder beyond the bound) raises; the
    reference's ingestion layer tolerates bounded retries the same way
    (lib/osm_utils.py:52-66).

    Rows with NULL lat/lon are watermark PUNCTUATION (Flink-style): they
    advance the entity's watermark to ``ts - lateness`` without becoming
    positions — the stream's end-of-input flush. Events with
    ``ts < watermark`` are final (later arrivals at exactly the watermark
    stay buffered until it strictly passes them).

    State per entity: the watermark, the last emitted position, and the
    pending buffer — bounded by the entity's event rate x lateness
    window, the same bound Spark's own watermarked aggregations carry.
    """
    import numpy as np
    import pandas as pd

    from ..functions.cells import tile_key

    lateness_ns = int(lateness_s) * 1_000_000_000
    NEG = np.iinfo(np.int64).min

    def kernel(key, pdf_iter, state):
        if state.exists:
            wm, has_last, lts, leid, ltile, bts, beid, btile = state.get
            buf_ts = np.frombuffer(bts, dtype=np.int64)
            buf_eid = np.frombuffer(beid, dtype=np.int64)
            buf_tile = np.frombuffer(btile, dtype=np.int64)
        else:
            wm, has_last, lts, leid, ltile = NEG, 0, 0, 0, 0
            buf_ts = buf_eid = buf_tile = np.empty(0, dtype=np.int64)
        wm = int(wm)

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            ts_ns = pdf[ts_col].to_numpy("datetime64[ns]").astype("int64")
            punct = pdf[lat].isna().to_numpy() | pdf[lon].isna().to_numpy()
            real = ~punct
            if real.any():
                r_ts = ts_ns[real]
                if int(r_ts.min()) < wm:
                    raise ValueError(
                        f"event beyond bounded lateness for entity "
                        f"{key[0]}: ts {int(r_ts.min())} is below the "
                        f"passed watermark {wm} (lateness_s={lateness_s})"
                    )
                buf_ts = np.concatenate([buf_ts, r_ts])
                buf_eid = np.concatenate(
                    [buf_eid, pdf.loc[real, id_col].to_numpy(np.int64)]
                )
                buf_tile = np.concatenate(
                    [
                        buf_tile,
                        tile_key(
                            pdf.loc[real, lat].to_numpy(),
                            pdf.loc[real, lon].to_numpy(),
                            res,
                        ),
                    ]
                )
            wm = max(wm, int(ts_ns.max()) - lateness_ns)

        ready = buf_ts < wm
        if ready.any():
            order = np.lexsort((buf_eid[ready], buf_ts[ready]))
            e_ts = buf_ts[ready][order]
            e_eid = buf_eid[ready][order]
            e_tile = buf_tile[ready][order]
            if has_last:
                from_tiles = np.concatenate(([np.int64(ltile)], e_tile[:-1]))
                to_tiles = e_tile
            else:
                from_tiles = e_tile[:-1]
                to_tiles = e_tile[1:]
            has_last, lts, leid, ltile = (
                1, int(e_ts[-1]), int(e_eid[-1]), int(e_tile[-1]),
            )
            keep = ~ready
            buf_ts, buf_eid, buf_tile = buf_ts[keep], buf_eid[keep], buf_tile[keep]
            out = pd.DataFrame(
                {
                    entity_col: np.repeat(np.int64(key[0]), len(to_tiles)),
                    "from_tile": from_tiles.astype(np.int64),
                    "to_tile": to_tiles.astype(np.int64),
                }
            )
        else:
            out = pd.DataFrame(
                columns=[entity_col, "from_tile", "to_tile"]
            ).astype(
                {entity_col: "int64", "from_tile": "int64", "to_tile": "int64"}
            )
        state.update(
            (
                int(wm), int(has_last), int(lts), int(leid), int(ltile),
                buf_ts.tobytes(), buf_eid.tobytes(), buf_tile.tobytes(),
            )
        )
        yield out

    return stream.groupBy(entity_col).applyInPandasWithState(
        kernel,
        outputStructType=f"{entity_col} long, from_tile long, to_tile long",
        stateStructType=(
            "wm long, has_last int, lts long, leid long, ltile long, "
            "bts binary, beid binary, btile binary"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_od_late_stream_once(
    spark: SparkSession, events_dir: str, checkpoint: str,
    res: int = 8, lateness_s: int = 3600,
) -> DataFrame:
    """Drive the bounded-lateness OD extractor over all staged files
    (availableNow, one file per trigger) and roll the emitted
    transitions up to the batch ``od_flows`` shape — same downstream
    rollup rationale as ``run_od_stream_once``."""
    schema = spark.read.parquet(events_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    name = f"od_late_stream_{abs(hash(events_dir)) % 10**8}"
    q = (
        stream_od_transitions_late(st, res=res, lateness_s=lateness_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.table(name)
    ent = t.columns[0]  # the entity key column (not hard-coded 'user_id')
    return t.groupBy("from_tile", "to_tile").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct(ent).alias("n_entities"),
    )


def run_od_stream_once(
    spark: SparkSession, events_dir: str, checkpoint: str, res: int = 8
) -> DataFrame:
    """Drive the streaming OD extractor over all staged files
    (availableNow) and roll the emitted transitions up to the batch
    ``od_flows`` shape (from_tile, to_tile, n_trips, n_entities). The
    rollup runs batch-side over the memory sink — chaining a streaming
    aggregation after a stateful append source would need its own
    output-mode gymnastics and is not what a deployment does (transitions
    land in a log; flows are a downstream rollup)."""
    schema = spark.read.parquet(events_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    name = f"od_stream_{abs(hash(events_dir)) % 10**8}"
    q = (
        stream_od_transitions(st, res=res)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("from_tile", "to_tile")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct("user_id").alias("n_entities"),
        )
    )


def stream_geofence_transitions(
    stream: DataFrame,
    rings: dict[str, "object"],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Streaming geofence enter/exit detection (the live counterpart of
    operators/spatial.py ``geofence_transitions``): ``rings`` is the
    broadcastable polygon dimension {polygon_id: (n, 2) lat/lon ring
    array}; each micro-batch's positions get their zone from the SAME
    ray-cast kernel the batch PIP join refines with
    (functions/geo.points_in_polygon — identical half-open tie-breaks),
    unique ownership = lexicographically smallest containing polygon,
    NULL when outside all. Per-entity state carries (ts, id, zone);
    transitions (zone change, or first position inside a zone) emit as
    (entity, ts, id, from_zone, to_zone). Ordered-ingestion contract +
    loud raise, exactly as ``stream_od_transitions``.

    Scale: the ring dim rides the closure (a few KB per polygon — the
    admin-boundary case that outgrows this would pre-join a cover tile
    dimension stream-static instead); state is one row per entity.
    """
    import numpy as np
    import pandas as pd

    from ..functions import geo

    pids = sorted(rings)
    ring_arrays = [np.asarray(rings[p], dtype=np.float64) for p in pids]

    def zone_of(lats: "np.ndarray", lons: "np.ndarray") -> "np.ndarray":
        out = np.full(len(lats), None, dtype=object)
        # reversed: earlier (smaller) ids overwrite later ones -> min id
        for pid, ring in zip(reversed(pids), reversed(ring_arrays)):
            inside = geo.points_in_polygon(lats, lons, ring)
            out[inside] = pid
        return out

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(
                columns=[entity_col, ts_col, id_col, "from_zone", "to_zone"]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        ts_ns = pdf[ts_col].astype("int64").to_numpy()
        eids = pdf[id_col].astype("int64").to_numpy()
        zones = zone_of(pdf[lat].to_numpy(), pdf[lon].to_numpy())
        if state.exists:
            lts, leid, lzone = state.get
            if (ts_ns[0], eids[0]) <= (int(lts), int(leid)):
                raise ValueError(
                    f"out-of-order micro-batch for entity {key[0]}: the "
                    "ordered-ingestion contract is broken"
                )
            prev = np.concatenate(([lzone if lzone != "" else None], zones[:-1]))
            emit = prev != zones
        else:
            prev = np.concatenate(([None], zones[:-1]))
            emit = prev != zones
            emit[0] = zones[0] is not None
        state.update(
            (int(ts_ns[-1]), int(eids[-1]),
             zones[-1] if zones[-1] is not None else "")
        )
        out = pd.DataFrame(
            {
                entity_col: pdf[entity_col].to_numpy()[emit],
                ts_col: pdf[ts_col].to_numpy()[emit],
                id_col: eids[emit],
                "from_zone": prev[emit],
                "to_zone": zones[emit],
            }
        )
        yield out

    return stream.groupBy(entity_col).applyInPandasWithState(
        kernel,
        outputStructType=(
            f"{entity_col} long, {ts_col} timestamp, {id_col} long, "
            "from_zone string, to_zone string"
        ),
        stateStructType="lts long, leid long, lzone string",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_geofence_stream_once(
    spark: SparkSession,
    events_dir: str,
    checkpoint: str,
    rings: dict[str, "object"],
) -> DataFrame:
    """Drive the streaming geofence detector over all staged files
    (availableNow, one file per trigger) and return the emitted
    transition log from the memory sink."""
    schema = spark.read.parquet(events_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    name = f"gf_stream_{abs(hash(events_dir)) % 10**8}"
    q = (
        stream_geofence_transitions(st, rings)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_decayed_tiles(
    stream: DataFrame, res: int, anchor_epoch: int, halflife_s: int,
    max_halvings: int = 16, lat: str = "lat", lon: str = "lon", ts: str = "ts",
) -> DataFrame:
    """Streaming recency-decayed raster state: the batch ``decayed_tiles``
    (operators/heatmap.py) unchanged on a streaming frame — the decay
    weight is a per-event column expression against a FIXED anchor, so
    the stateful per-tile sum stays associative-exact and state is
    bounded by occupied tiles. Same code as batch, not a parallel
    implementation that could drift. (A sliding "now" anchor is served
    by rescaling the stored sum by 2^-(delta // halflife) on read — the
    stored state never needs rewriting; out of gate scope.)"""
    from ..operators.heatmap import decayed_tiles

    return decayed_tiles(
        stream, res, anchor_epoch, halflife_s, max_halvings, lat, lon, ts
    )


def run_decayed_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str,
    res: int, anchor_epoch: int, halflife_s: int,
) -> DataFrame:
    """Drive the streaming decayed raster over all staged files
    (availableNow, complete mode, memory sink) and return the final
    state; batch parity with ``decayed_tiles`` is the oracle contract."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    q = (
        stream_decayed_tiles(
            st, res=res, anchor_epoch=anchor_epoch, halflife_s=halflife_s
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("decay_stream")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("decay_stream")


def stream_tile_cap(
    stream: DataFrame, res: int, cap: int,
    id_col: str = "point_id", salt: str = "cap0",
) -> DataFrame:
    """Streaming per-tile cap sampling (applyInPandasWithState): each
    tile's state is the ``cap`` smallest (md5-hash, id) pairs seen so
    far — a MONOTONE bounded reservoir. Unlike a random reservoir, the
    hash-rank top-cap is a pure function of the SET of rows seen, so
    the final state equals the batch ``tile_cap_sample`` answer
    regardless of arrival order or batching — that's the parity
    contract the gate checks. State is <= cap (id, hash) pairs per
    tile, ever. Emits one update row per (tile, trigger) carrying the
    current kept ids in rank order plus the running seen count.

    Ids must be integral (the state blob and the ``ids array<long>``
    output serialize int64): batch ``tile_cap_sample`` accepts any
    orderable id, so the narrower streaming contract is validated UP
    FRONT with a clear error instead of a mid-stream kernel crash."""
    import numpy as np
    import pandas as pd

    from ..operators.sampling import _hash32
    from ..operators.tiling import assign_tiles

    id_type = stream.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"stream_tile_cap: id column {id_col!r} is {id_type}, but the "
            "streaming state/output serialize int64 ids — cast to an "
            "integral type first, or use batch tile_cap_sample (which "
            "accepts any orderable id)"
        )

    keyed = assign_tiles(stream, res=res).select(
        "tile",
        F.col(id_col).alias("__id"),
        _hash32(F.col(id_col), salt).alias("__h"),
    )

    def kernel(key, pdf_iter, state):
        ids = np.empty(0, dtype=np.int64)
        hs = np.empty(0, dtype=np.int64)
        n_seen = 0
        if state.exists:
            ids_b, hs_b, n_seen = state.get
            ids = np.frombuffer(ids_b, dtype=np.int64)
            hs = np.frombuffer(hs_b, dtype=np.int64)
        for pdf in pdf_iter:
            n_seen = int(n_seen) + len(pdf)
            ids = np.concatenate([ids, pdf["__id"].to_numpy(dtype=np.int64)])
            hs = np.concatenate([hs, pdf["__h"].to_numpy(dtype=np.int64)])
            order = np.lexsort((ids, hs))[:cap]
            ids, hs = ids[order], hs[order]
        state.update((ids.tobytes(), hs.tobytes(), int(n_seen)))
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "ids": [ids.tolist()],
                "n_seen": [int(n_seen)],
            }
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        kernel,
        outputStructType="tile long, ids array<long>, n_seen long",
        stateStructType="ids_b binary, hs_b binary, n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_tile_cap_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str,
    res: int, cap: int,
) -> DataFrame:
    """Drive the streaming cap reservoir over all staged files (one per
    trigger) and flatten each tile's FINAL state to (point_id, tile,
    rk) — the exact schema and values of batch ``tile_cap_sample``."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    q = (
        stream_tile_cap(st, res=res, cap=cap)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tile_cap_stream")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        """
        SELECT point_id, tile, CAST(pos + 1 AS INT) AS rk FROM (
          SELECT *, row_number() OVER (PARTITION BY tile ORDER BY n_seen DESC) AS rn
          FROM tile_cap_stream
        ) latest
        LATERAL VIEW posexplode(ids) t AS pos, point_id
        WHERE rn = 1
        """
    )


def stream_tile_first_seen(
    stream: DataFrame, res: int, ts_col: str = "ts",
    lat: str = "lat", lon: str = "lon",
) -> DataFrame:
    """Streaming coverage-novelty state (applyInPandasWithState): per
    tile, the running (first_day, distinct active days, event count).
    min / set-union / count are order-free, so the final state equals
    batch ``tile_first_seen`` under ANY arrival order or batching — no
    ordered-ingestion contract needed (the strongest parity class, like
    stream_tile_cap's monotone reservoir). State per tile is the sorted
    unique day array — bounded by the calendar, not the event rate.
    Emits one update row per (tile, trigger)."""
    import numpy as np
    import pandas as pd

    from ..operators.tiling import assign_tiles

    day = (F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
    keyed = assign_tiles(stream, res=res, lat=lat, lon=lon).select(
        "tile", day.alias("__day")
    )

    def kernel(key, pdf_iter, state):
        days = np.empty(0, dtype=np.int64)
        n_events = 0
        if state.exists:
            days_b, n_events = state.get
            days = np.frombuffer(days_b, dtype=np.int64)
        for pdf in pdf_iter:
            n_events = int(n_events) + len(pdf)
            days = np.unique(
                np.concatenate([days, pdf["__day"].to_numpy(np.int64)])
            )
        state.update((days.tobytes(), int(n_events)))
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "first_day": [int(days[0]) if len(days) else None],
                "n_days": [len(days)],
                "n_events": [int(n_events)],
            }
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        kernel,
        outputStructType="tile long, first_day long, n_days long, n_events long",
        stateStructType="days_b binary, n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_tile_first_seen_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str, res: int
) -> DataFrame:
    """Drive the streaming first-seen state over all staged files (one
    per trigger) and return each tile's FINAL state — the exact schema
    and values of batch ``tile_first_seen``."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"first_seen_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_tile_first_seen(st, res=res)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT tile, first_day, n_days, n_events FROM (
          SELECT *, row_number() OVER (
            PARTITION BY tile ORDER BY n_events DESC, n_days DESC
          ) AS rn
          FROM {name}
        ) WHERE rn = 1
        """
    )


def stream_gyration_moments(
    stream: DataFrame,
    entity_col: str = "user_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Streaming radius-of-gyration state: per entity the running
    micro-degree moment sums (n, sx, sy, sxx, syy) — sums are
    associative and commutative, so the final state equals the batch
    moments under ANY arrival order or batching (the strongest parity
    class; no ordering contract). int64 state holds while an entity's
    sxx stays under 2^63 (~4.5e3 years of 1 Hz positions at max
    latitude); the batch operator's DECIMAL path is the overflow-scale
    variant. Emits one update row per (entity, trigger)."""
    import pandas as pd

    x = F.floor(F.col(lat) * F.lit(1_000_000.0)).cast("long")
    y = F.floor(F.col(lon) * F.lit(1_000_000.0)).cast("long")
    keyed = stream.select(
        F.col(entity_col).alias("entity"), x.alias("__x"), y.alias("__y")
    )

    def kernel(key, pdf_iter, state):
        n = sx = sy = sxx = syy = 0
        if state.exists:
            n, sx, sy, sxx, syy = (int(v) for v in state.get)
        for pdf in pdf_iter:
            xs = pdf["__x"].astype("int64")
            ys = pdf["__y"].astype("int64")
            n += len(pdf)
            sx += int(xs.sum())
            sy += int(ys.sum())
            sxx += int((xs * xs).sum())
            syy += int((ys * ys).sum())
        state.update((n, sx, sy, sxx, syy))
        yield pd.DataFrame(
            {
                "entity": [key[0]],
                "n": [n], "sx": [sx], "sy": [sy], "sxx": [sxx], "syy": [syy],
            }
        )

    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType="entity long, n long, sx long, sy long, sxx long, syy long",
        stateStructType="n long, sx long, sy long, sxx long, syy long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_gyration_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str
) -> DataFrame:
    """Drive the streaming moments over all staged files and finish each
    entity's FINAL state with the same DECIMAL(38,0) rational-rg^2
    algebra as batch ``radius_of_gyration`` — byte-identical output
    schema and values."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"gyr_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_gyration_moments(st)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT entity, CAST(n AS BIGINT) AS n_events,
               CAST(CAST(n AS decimal(38,0))
                    * (CAST(sxx AS decimal(38,0)) + CAST(syy AS decimal(38,0)))
                    - CAST(sx AS decimal(38,0)) * CAST(sx AS decimal(38,0))
                    - CAST(sy AS decimal(38,0)) * CAST(sy AS decimal(38,0))
                 AS decimal(38,0)) AS rg2_num,
               CAST(CAST(n AS decimal(38,0)) * CAST(n AS decimal(38,0))
                 AS decimal(38,0)) AS rg2_den
        FROM (
          SELECT *, row_number() OVER (PARTITION BY entity ORDER BY n DESC) AS rn
          FROM {name}
        ) WHERE rn = 1
        """
    )


def stream_staypoints(
    stream: DataFrame,
    dist_micro: int,
    min_stay_s: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    scale: int = 1_000_000,
) -> DataFrame:
    """Stateful streaming stay-point detection (the streaming half of
    operators/spatial.py ``staypoints``): per entity, state carries the
    OPEN anchor segment (anchor coords/rn/epoch + last-extended
    position); each micro-batch walks its (ts, id)-sorted positions,
    emits every segment CLOSED in that batch that met ``min_stay_s``
    (closed = 1, exactly once, in the trigger where the radius broke)
    plus one open-segment snapshot row per trigger (closed = 0, ``seen``
    = points processed so far — monotone, so the final snapshot is
    selectable downstream). ``run_staypoints_stream_once`` finishes the
    open segment the way the batch walk finishes its trailing segment.

    Ingestion contract: event-time order ACROSS micro-batches per entity
    (same as ``stream_od_transitions``) — an out-of-order batch RAISES,
    because an anchor walk replayed out of order is a different walk.
    The anchor keep/break decision is the identical integer-squared
    compare as batch, so final output is byte-equal, not approximately
    equal.
    """
    import numpy as np
    import pandas as pd

    if dist_micro < 1:
        raise ValueError(f"dist_micro must be >= 1, got {dist_micro}")
    d2 = dist_micro * dist_micro
    cols = [
        "entity", "start_rn", "end_rn", "n_pts",
        "start_ep", "end_ep", "ax", "ay", "closed", "seen",
    ]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        ts_ns = pdf[ts_col].astype("int64").to_numpy()
        eids = pdf[id_col].astype("int64").to_numpy()
        eps = ts_ns // 1_000_000_000
        xs = np.floor(
            (pdf[lon].to_numpy() + 180.0) * float(scale)
        ).astype(np.int64)
        ys = np.floor(
            (pdf[lat].to_numpy() + 90.0) * float(scale)
        ).astype(np.int64)
        rows = []
        if state.exists:
            ax, ay, a_rn, a_ep, l_rn, l_ep, l_eid, seen = (
                int(v) for v in state.get
            )
            if (int(ts_ns[0] // 1_000_000_000), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {key[0]}: the "
                    "ordered-ingestion contract is broken — a stay-point "
                    "anchor walk replayed out of order diverges from batch"
                )
            has_anchor = True
        else:
            ax = ay = a_rn = a_ep = l_rn = l_ep = l_eid = seen = 0
            has_anchor = False
        ent = int(key[0])
        for i in range(len(pdf)):
            seen += 1
            x, y, ep = int(xs[i]), int(ys[i]), int(eps[i])
            if not has_anchor:
                ax, ay, a_rn, a_ep = x, y, seen, ep
                l_rn, l_ep = seen, ep
                has_anchor = True
            elif (x - ax) ** 2 + (y - ay) ** 2 <= d2:
                l_rn, l_ep = seen, ep
            else:
                if l_ep - a_ep >= min_stay_s:
                    rows.append(
                        (ent, a_rn, l_rn, l_rn - a_rn + 1,
                         a_ep, l_ep, ax, ay, 1, seen)
                    )
                ax, ay, a_rn, a_ep = x, y, seen, ep
                l_rn, l_ep = seen, ep
            l_eid = int(eids[i])
        state.update((ax, ay, a_rn, a_ep, l_rn, l_ep, l_eid, seen))
        rows.append((ent, a_rn, l_rn, l_rn - a_rn + 1, a_ep, l_ep, ax, ay, 0, seen))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col), F.col(id_col), F.col(lat), F.col(lon),
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType=(
            "entity long, start_rn long, end_rn long, n_pts long, "
            "start_ep long, end_ep long, ax long, ay long, "
            "closed long, seen long"
        ),
        stateStructType=(
            "ax long, ay long, a_rn long, a_ep long, "
            "l_rn long, l_ep long, l_eid long, seen long"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_staypoints_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    dist_micro: int,
    min_stay_s: int,
) -> DataFrame:
    """Drive the streaming stay-point kernel over all staged files and
    finish each entity's final OPEN segment exactly as the batch walk
    finishes its trailing segment: the last open-snapshot row (max
    ``seen``) qualifies iff it lasted ``min_stay_s``. Closed rows pass
    through untouched — the union is byte-equal to batch
    ``staypoints``."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"stay_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_staypoints(st, dist_micro, min_stay_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT entity, start_rn, end_rn, n_pts, start_ep, end_ep, ax, ay
        FROM {name} WHERE closed = 1
        UNION ALL
        SELECT entity, start_rn, end_rn, n_pts, start_ep, end_ep, ax, ay
        FROM (
          SELECT *, row_number() OVER (PARTITION BY entity
                                       ORDER BY seen DESC) AS rn2
          FROM {name} WHERE closed = 0
        ) WHERE rn2 = 1 AND end_ep - start_ep >= {min_stay_s}
        """
    )


def stream_dwell(
    stream: DataFrame,
    res: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful streaming dwell segmentation (the streaming half of
    operators/tiling.py ``dwell_time``): per entity, state carries the
    last event's (epoch, tile); every new event CLOSES the previous
    segment and emits (tile, entity, gap) — the segment's start tile
    and exact epoch-second duration — including segments that span
    micro-batch boundaries. ``run_dwell_stream_once`` rolls the
    emitted segments into the batch operator's exact output.

    Tile assignment uses the numpy ``tile_key`` twin of the batch
    ``tile_key_col`` (bit-identical, property-tested), so final output
    is byte-equal to batch, not approximately equal.

    Ingestion contract: event-time order ACROSS micro-batches per
    entity (same as ``stream_staypoints``) — an out-of-order batch
    RAISES, because a dwell segment replayed out of order is a
    different segment."""
    import pandas as pd

    from ..functions.cells import tile_key

    cols = ["tile", "entity", "gap"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        tiles = tile_key(pdf[lat].to_numpy(), pdf[lon].to_numpy(), res)
        ent = int(key[0])
        if state.exists:
            l_ep, l_tile, l_eid = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {ent}: the "
                    "ordered-ingestion contract is broken — a dwell "
                    "segment replayed out of order diverges from batch"
                )
            has_prev = True
        else:
            l_ep = l_tile = l_eid = 0
            has_prev = False
        rows = []
        for i in range(len(pdf)):
            ep, tile = int(eps[i]), int(tiles[i])
            if has_prev:
                rows.append((l_tile, ent, ep - l_ep))
            l_ep, l_tile, l_eid = ep, tile, int(eids[i])
            has_prev = True
        state.update((l_ep, l_tile, l_eid))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col), F.col(id_col), F.col(lat), F.col(lon),
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType="tile long, entity long, gap long",
        stateStructType="l_ep long, l_tile long, l_eid long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_dwell_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    res: int,
) -> DataFrame:
    """Drive the streaming dwell kernel over all staged files and roll
    the emitted (tile, entity, gap) segments into exactly the batch
    ``dwell_time`` shape: (tile, total_dwell_s, n_segments,
    n_entities). Every segment is emitted exactly once (when the next
    event closes it), so the rollup is byte-equal to batch."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"dwell_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_dwell(st, res)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT tile, sum(gap) AS total_dwell_s,
               count(*) AS n_segments,
               count(DISTINCT entity) AS n_entities
        FROM {name} GROUP BY tile
        """
    )


def stream_wait_time(
    stream: DataFrame,
    res: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful streaming inter-arrival tracker (the streaming half of
    operators/tiling.py ``wait_time_hist``): keyed by the res-cell
    (computed with the batch ``tile_key_col`` twin, bit-identical),
    state carries the cell's last (epoch, id); every event emits the
    gap to its predecessor IN THAT CELL — including gaps spanning
    micro-batch boundaries. ``run_wait_time_stream_once`` rolls the
    gaps into the batch operator's exact log2-bucket histogram.

    Ingestion contract: event-time order ACROSS micro-batches per cell
    (implied by globally time-ordered staging) — an out-of-order batch
    RAISES."""
    import pandas as pd

    from ..functions.cells import tile_key_col

    cols = ["tile", "gap"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        tile = int(key[0])
        if state.exists:
            l_ep, l_eid = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for tile {tile}: the "
                    "ordered-ingestion contract is broken — an "
                    "inter-arrival gap replayed out of order diverges "
                    "from batch"
                )
            has_prev = True
        else:
            l_ep = l_eid = 0
            has_prev = False
        rows = []
        for i in range(len(pdf)):
            ep = int(eps[i])
            if has_prev:
                rows.append((tile, ep - l_ep))
            l_ep, l_eid = ep, int(eids[i])
            has_prev = True
        state.update((l_ep, l_eid))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        tile_key_col(F.col(lat), F.col(lon), res).alias("tile"),
        F.col(ts_col), F.col(id_col),
    )
    return keyed.groupBy("tile").applyInPandasWithState(
        kernel,
        outputStructType="tile long, gap long",
        stateStructType="l_ep long, l_eid long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_wait_time_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    res: int,
) -> DataFrame:
    """Drive the streaming wait-time kernel over all staged files and
    roll the emitted gaps into exactly the batch ``wait_time_hist``
    shape: (bucket, n_gaps, total_gap_s, max_gap_s) with the same
    length(bin(gap)) integer bucketing."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"wait_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_wait_time(st, res)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT CAST(length(bin(gap)) AS INT) AS bucket,
               count(*) AS n_gaps,
               sum(gap) AS total_gap_s,
               max(gap) AS max_gap_s
        FROM {name} GROUP BY 1
        """
    )


def stream_speed_outliers(
    stream: DataFrame,
    vmax_micro: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
    scale: int = 1_000_000,
) -> DataFrame:
    """Stateful streaming GPS teleport detector (the streaming half of
    operators/spatial.py ``speed_outliers``): per entity, state carries
    the last event's (epoch, x, y); each event closes a segment and
    emits it iff the exact integer test dist2 > (vmax * dt)^2 flags it
    — Python ints are unbounded so the squared budget needs no decimal
    staging. Emits (entity, start_ep, end_ep, dt_s, dist2) exactly
    once per flagged segment, byte-equal to batch.

    Ingestion contract: event-time order ACROSS micro-batches per
    entity (same as ``stream_dwell``) — an out-of-order batch RAISES."""
    import numpy as np
    import pandas as pd

    if vmax_micro < 1:
        raise ValueError(f"vmax_micro must be >= 1, got {vmax_micro}")
    cols = ["entity", "start_ep", "end_ep", "dt_s", "dist2"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        xs = np.floor((pdf[lon].to_numpy() + 180.0) * float(scale)).astype(
            np.int64
        )
        ys = np.floor((pdf[lat].to_numpy() + 90.0) * float(scale)).astype(
            np.int64
        )
        ent = int(key[0])
        if state.exists:
            l_ep, l_x, l_y, l_eid = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {ent}: the "
                    "ordered-ingestion contract is broken — a speed "
                    "segment replayed out of order diverges from batch"
                )
            has_prev = True
        else:
            l_ep = l_x = l_y = l_eid = 0
            has_prev = False
        rows = []
        for i in range(len(pdf)):
            ep, x, y = int(eps[i]), int(xs[i]), int(ys[i])
            if has_prev:
                dt = ep - l_ep
                d2 = (x - l_x) ** 2 + (y - l_y) ** 2
                if d2 > (vmax_micro * dt) ** 2:
                    rows.append((ent, l_ep, ep, dt, d2))
            l_ep, l_x, l_y, l_eid = ep, x, y, int(eids[i])
            has_prev = True
        state.update((l_ep, l_x, l_y, l_eid))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col), F.col(id_col), F.col(lat), F.col(lon),
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType=(
            "entity long, start_ep long, end_ep long, dt_s long, dist2 long"
        ),
        stateStructType="l_ep long, l_x long, l_y long, l_eid long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_speed_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    vmax_micro: int,
) -> DataFrame:
    """Drive the streaming teleport detector over all staged files; the
    emitted rows ARE the batch ``speed_outliers`` output (no rollup
    needed — flagged segments emit exactly once)."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"speed_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_speed_outliers(st, vmax_micro)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT entity, start_ep, end_ep, dt_s, dist2 FROM {name}"
    )


def stream_cohorts(
    stream: DataFrame,
    period_s: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Stateful streaming cohort tracker (the streaming half of
    operators/tiling.py ``user_cohorts``): per entity, state carries
    (cohort = first active period, last emitted period); because the
    ordered-ingestion contract guarantees per-entity event-time order,
    a NEW active period is exactly an event whose period exceeds the
    last emitted one — each (entity, period) emits exactly once with
    its cohort attached, across micro-batch boundaries.
    ``run_cohorts_stream_once`` rolls the emissions into the batch
    operator's exact retention triangle."""
    import pandas as pd

    if period_s < 1:
        raise ValueError(f"period_s must be >= 1, got {period_s}")
    cols = ["entity", "cohort", "period"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        ent = int(key[0])
        if state.exists:
            cohort, last_p, l_ep, l_eid = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {ent}: the "
                    "ordered-ingestion contract is broken — a cohort "
                    "walk replayed out of order diverges from batch"
                )
            has_state = True
        else:
            cohort = last_p = l_ep = l_eid = 0
            has_state = False
        rows = []
        for i in range(len(pdf)):
            p = int(eps[i]) // period_s
            if not has_state:
                cohort, last_p = p, p
                rows.append((ent, cohort, p))
                has_state = True
            elif p > last_p:
                rows.append((ent, cohort, p))
                last_p = p
            l_ep, l_eid = int(eps[i]), int(eids[i])
        state.update((cohort, last_p, l_ep, l_eid))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"), F.col(ts_col), F.col(id_col)
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType="entity long, cohort long, period long",
        stateStructType="cohort long, last_p long, l_ep long, l_eid long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_cohorts_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    period_s: int,
) -> DataFrame:
    """Drive the streaming cohort tracker over all staged files and
    roll the (entity, cohort, period) emissions into exactly the batch
    ``user_cohorts`` shape: (cohort_period, periods_since, n_active)."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"cohort_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_cohorts(st, period_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT cohort AS cohort_period, period - cohort AS periods_since,
               count(DISTINCT entity) AS n_active
        FROM {name} GROUP BY 1, 2
        """
    )


def stream_trip_od(
    stream: DataFrame,
    max_gap_s: int,
    res: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful streaming trip-endpoint extractor (the streaming half of
    operators/spatial.py ``trip_od``): per entity, state carries the
    OPEN trip's (origin cell, last cell, last epoch); a gap beyond
    ``max_gap_s`` CLOSES the trip — its (from, to) emits exactly once
    (closed = 1) — and every trigger also emits one open-trip snapshot
    (closed = 0, monotone ``seen``) so ``run_trip_od_stream_once`` can
    finish the final open trip the way batch finishes its trailing
    trip. Cells come from the numpy ``tile_key`` twin (bit-identical to
    batch). Ordered-ingestion contract as everywhere: an out-of-order
    batch RAISES."""
    import pandas as pd

    from ..functions.cells import tile_key

    if max_gap_s < 1:
        raise ValueError(f"max_gap_s must be >= 1, got {max_gap_s}")
    cols = ["entity", "from_tile", "to_tile", "closed", "seen"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        tiles = tile_key(pdf[lat].to_numpy(), pdf[lon].to_numpy(), res)
        ent = int(key[0])
        if state.exists:
            o_tile, l_tile, l_ep, l_eid, seen = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {ent}: the "
                    "ordered-ingestion contract is broken — a trip walk "
                    "replayed out of order diverges from batch"
                )
            has_trip = True
        else:
            o_tile = l_tile = l_ep = l_eid = seen = 0
            has_trip = False
        rows = []
        for i in range(len(pdf)):
            ep, tile = int(eps[i]), int(tiles[i])
            seen += 1
            if has_trip and ep - l_ep > max_gap_s:
                rows.append((ent, o_tile, l_tile, 1, seen))
                has_trip = False
            if not has_trip:
                o_tile = tile
                has_trip = True
            l_tile, l_ep, l_eid = tile, ep, int(eids[i])
        state.update((o_tile, l_tile, l_ep, l_eid, seen))
        rows.append((ent, o_tile, l_tile, 0, seen))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col), F.col(id_col), F.col(lat), F.col(lon),
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType=(
            "entity long, from_tile long, to_tile long, closed long, seen long"
        ),
        stateStructType=(
            "o_tile long, l_tile long, l_ep long, l_eid long, seen long"
        ),
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_trip_od_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    max_gap_s: int,
    res: int,
) -> DataFrame:
    """Drive the streaming trip extractor over all staged files, finish
    each entity's final OPEN trip (max ``seen`` snapshot), and roll the
    endpoints into exactly the batch ``trip_od`` shape — stationary
    trips excluded."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"tripod_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_trip_od(st, max_gap_s, res)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        WITH trips AS (
          SELECT entity, from_tile, to_tile FROM {name} WHERE closed = 1
          UNION ALL
          SELECT entity, from_tile, to_tile FROM (
            SELECT *, row_number() OVER (PARTITION BY entity
                                         ORDER BY seen DESC) AS rn2
            FROM {name} WHERE closed = 0
          ) WHERE rn2 = 1
        )
        SELECT from_tile, to_tile, count(*) AS n_trips,
               count(DISTINCT entity) AS n_entities
        FROM trips WHERE from_tile <> to_tile GROUP BY 1, 2
        """
    )


def stream_cms_hitters(
    stream: DataFrame, res: int, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Streaming count-min sketch + hot-key counts as ONE stateful
    operator (applyInPandasWithState): every event fans into
    CMS_DEPTH counter-cell increments (kind i, bucket) plus one exact
    key increment (kind CMS_DEPTH, tile); each group's state is a
    single additive counter. Addition is commutative and associative,
    so the final states equal batch ``cms_heavy_hitters``'s counter
    table and key histogram under ANY arrival order or batching — the
    strongest parity class (like stream_tile_first_seen). The sketch
    side holds at most CMS_DEPTH * width groups REGARDLESS of event
    rate; the key side is bounded by occupied cells. Emits one running
    (kind, id, n) row per touched group per trigger; heavy-hitter
    extraction happens once over final states via the SAME
    ``cms_score`` back half the batch operator uses."""
    import pandas as pd

    from ..operators.sketches import CMS_DEPTH, CMS_SALTS, CMS_WIDTH, cms_bucket

    key = F.col("tile")
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("kind"),
                    cms_bucket(key, CMS_SALTS[i], CMS_WIDTH).alias("id"),
                )
                for i in range(CMS_DEPTH)
            ],
            F.struct(F.lit(CMS_DEPTH).alias("kind"), key.alias("id")),
        )
    ).alias("g")
    keyed = (
        assign_tiles(stream, res=res, lat=lat, lon=lon)
        .select(fan)
        .select("g.kind", "g.id")
    )

    def kernel(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n = int(n) + len(pdf)
        state.update((int(n),))
        yield pd.DataFrame({"kind": [key[0]], "id": [key[1]], "n": [int(n)]})

    return keyed.groupBy("kind", "id").applyInPandasWithState(
        kernel,
        outputStructType="kind int, id long, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_cms_stream_once(
    spark: SparkSession,
    points_dir: str,
    checkpoint: str,
    res: int,
    mass_denom: int = 256,
) -> DataFrame:
    """Drive the streaming CMS over all staged files (one per trigger),
    take each group's FINAL (monotone) counter, and score heavy hitters
    with the batch operator's own ``cms_score`` — the exact schema and
    values of batch ``cms_heavy_hitters``."""
    from ..operators.sketches import CMS_DEPTH, cms_score

    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"cms_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_cms_hitters(st, res=res)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fin = spark.sql(
        f"""
        SELECT kind, id, n FROM (
          SELECT *, row_number() OVER (
            PARTITION BY kind, id ORDER BY n DESC
          ) AS rn FROM {name}
        ) WHERE rn = 1
        """
    ).localCheckpoint(eager=True)
    exact = fin.filter(F.col("kind") == CMS_DEPTH).select(
        F.col("id").alias("key"), F.col("n").alias("exact_n")
    )
    counters = fin.filter(F.col("kind") < CMS_DEPTH).select(
        F.col("kind").cast("int").alias("row"),
        F.col("id").alias("bucket"),
        F.col("n").alias("c"),
    )
    return cms_score(exact, counters, mass_denom)


def stream_line_density(
    stream: DataFrame,
    res: int,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Stateful streaming segment rasterizer (the streaming half of
    operators/spatial.py ``line_density``): per entity, state carries
    the LAST ping's (cell, epoch, event id); each new ping closes a
    segment and emits that segment's integer-interpolated cells exactly
    once, already per-segment deduped — the same
    ((x0*(s-i) + x1*i) div s) walk as batch, via the numpy
    ``tile_key`` twin. No trailing state to flush: a segment closes
    the moment its end ping arrives. Ordered-ingestion contract as
    everywhere: an out-of-order batch RAISES."""
    import numpy as np
    import pandas as pd

    from ..functions.cells import tile_key

    n = 1 << res
    cols = ["entity", "tile"]

    def kernel(key, pdf_iter, state):
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            yield pd.DataFrame(columns=cols).astype("int64")
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        eps = pdf[ts_col].astype("int64").to_numpy() // 1_000_000_000
        eids = pdf[id_col].astype("int64").to_numpy()
        tiles = tile_key(pdf[lat].to_numpy(), pdf[lon].to_numpy(), res)
        ent = int(key[0])
        if state.exists:
            prev, l_ep, l_eid = (int(v) for v in state.get)
            if (int(eps[0]), int(eids[0])) <= (l_ep, l_eid):
                raise ValueError(
                    f"out-of-order micro-batch for entity {ent}: the "
                    "ordered-ingestion contract is broken — a segment "
                    "walk replayed out of order diverges from batch"
                )
            has = True
        else:
            prev, has = 0, False
        rows = []
        for i in range(len(pdf)):
            t = int(tiles[i])
            if has:
                x0, y0 = prev // n, prev % n
                x1, y1 = t // n, t % n
                s = max(abs(x1 - x0), abs(y1 - y0))
                if s == 0:
                    cells = [prev]
                else:
                    ii = np.arange(s + 1, dtype=np.int64)
                    cx = (x0 * (s - ii) + x1 * ii) // s
                    cy = (y0 * (s - ii) + y1 * ii) // s
                    cells = np.unique(cx * n + cy).tolist()
                rows.extend((ent, int(c)) for c in cells)
            prev, has = t, True
        state.update((prev, int(eps[-1]), int(eids[-1])))
        yield pd.DataFrame(rows, columns=cols)

    keyed = stream.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col), F.col(id_col), F.col(lat), F.col(lon),
    )
    return keyed.groupBy("entity").applyInPandasWithState(
        kernel,
        outputStructType="entity long, tile long",
        stateStructType="l_tile long, l_ep long, l_eid long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def run_line_density_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str, res: int
) -> DataFrame:
    """Drive the streaming segment rasterizer over all staged files and
    roll the emitted (segment, cell) rows into exactly the batch
    ``line_density`` shape."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"linedens_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_line_density(st, res=res)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        SELECT tile, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(DISTINCT entity) AS BIGINT) AS n_entities
        FROM {name} GROUP BY 1
        """
    )


def stream_tile_trend(
    stream: DataFrame,
    res: int,
    value_col: str = "value",
    ts_col: str = "ts",
    q_scale: int = 1000,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Streaming per-cell TREND state: the five OLS moment sums of batch
    ``tile_trend`` — (n, st, sy, sty, stt) over t = epoch day and
    y = round(value * q_scale) — kept per tile. The sums are associative
    and commutative, so the final state equals the batch moments under
    ANY arrival order or batching (the order-free parity class of
    ``stream_gyration_moments``; no ordering contract). int64 holds by
    the same bound as batch (day ~ 2e4, |y| <= ~1e6, per-cell n <= ~1e6
    keeps every term under 2^63). Emits one update row per
    (tile, trigger)."""
    import pandas as pd

    from ..functions.cells import tile_key_col

    day = (F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
    yq = F.round(F.col(value_col).cast("double") * q_scale).cast("long")
    keyed = stream.select(
        tile_key_col(F.col(lat), F.col(lon), res).alias("tile"),
        day.alias("__t"),
        yq.alias("__y"),
    )

    def kernel(key, pdf_iter, state):
        n = st = sy = sty = stt = 0
        if state.exists:
            n, st, sy, sty, stt = (int(v) for v in state.get)
        for pdf in pdf_iter:
            ts = pdf["__t"].astype("int64")
            ys = pdf["__y"].astype("int64")
            n += len(pdf)
            st += int(ts.sum())
            sy += int(ys.sum())
            sty += int((ts * ys).sum())
            stt += int((ts * ts).sum())
        state.update((n, st, sy, sty, stt))
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "n": [n], "st": [st], "sy": [sy], "sty": [sty], "stt": [stt],
            }
        )

    return keyed.groupBy("tile").applyInPandasWithState(
        kernel,
        outputStructType="tile long, n long, st long, sy long, sty long, stt long",
        stateStructType="n long, st long, sy long, sty long, stt long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_tile_trend_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str, res: int
) -> DataFrame:
    """Drive the streaming trend moments over all staged files and finish
    each tile's FINAL state with the same rational-slope algebra as batch
    ``tile_trend`` — byte-identical output schema and values."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"trend_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_tile_trend(st, res=res)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink keeps every trigger's row; the per-tile
    # final state is the one with the largest n (sums only grow)
    return spark.sql(
        f"""
        WITH fin AS (
          SELECT tile, n, st, sy, sty, stt,
                 row_number() OVER (PARTITION BY tile ORDER BY n DESC) AS rk
          FROM {name}
        )
        SELECT tile, CAST(n AS BIGINT) AS n_events, CAST(st AS BIGINT) AS sum_t,
               CAST(sy AS BIGINT) AS sum_y,
               CAST(n * sty - st * sy AS BIGINT) AS slope_num,
               CAST(n * stt - st * st AS BIGINT) AS slope_den
        FROM fin WHERE rk = 1
        """
    )


def stream_centroid_moments(
    stream: DataFrame,
    ts_col: str = "ts",
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Streaming daily activity-center state: per epoch-day the running
    (n, sum_x, sum_y) micro-degree moments — order-free sums (the
    strongest parity class), so the final per-day state equals the
    batch daily rollup of ``centroid_drift`` under ANY arrival order.
    Emits one update row per (day, trigger)."""
    import pandas as pd

    keyed = stream.select(
        F.expr(f"div(unix_timestamp({ts_col}), 86400)").alias("day"),
        F.floor(F.col(lat) * F.lit(1_000_000.0)).cast("long").alias("__x"),
        F.floor(F.col(lon) * F.lit(1_000_000.0)).cast("long").alias("__y"),
    )

    def kernel(key, pdf_iter, state):
        n = sx = sy = 0
        if state.exists:
            n, sx, sy = (int(v) for v in state.get)
        for pdf in pdf_iter:
            xs = pdf["__x"].astype("int64")
            ys = pdf["__y"].astype("int64")
            n += len(pdf)
            sx += int(xs.sum())
            sy += int(ys.sum())
        state.update((n, sx, sy))
        yield pd.DataFrame({"day": [key[0]], "n": [n], "sx": [sx], "sy": [sy]})

    return keyed.groupBy("day").applyInPandasWithState(
        kernel,
        outputStructType="day long, n long, sx long, sy long",
        stateStructType="n long, sx long, sy long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_centroid_drift_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str
) -> DataFrame:
    """Drive the streaming daily moments over all staged files and
    finish with the batch ``centroid_drift`` lag algebra — byte-identical
    output schema and values."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"cdrift_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_centroid_moments(st)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        WITH fin AS (
          SELECT day, n, sx, sy,
                 row_number() OVER (PARTITION BY day ORDER BY n DESC) AS rk
          FROM {name}
        ),
        daily AS (SELECT day, n, sx, sy FROM fin WHERE rk = 1),
        lagged AS (
          SELECT day, n, sx, sy,
                 lag(n) OVER (ORDER BY day) AS pn,
                 lag(sx) OVER (ORDER BY day) AS px,
                 lag(sy) OVER (ORDER BY day) AS py
          FROM daily
        )
        SELECT day, CAST(n AS BIGINT) AS n_events,
               CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
               CAST(sx * pn - px * n AS BIGINT) AS dx_num,
               CAST(sy * pn - py * n AS BIGINT) AS dy_num,
               CAST(n * pn AS BIGINT) AS drift_den
        FROM lagged
        """
    )


def stream_hour_type_counts(
    stream: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming (hour-of-day x event-type) contingency state: running
    counts per cell — order-free sums keyed by (hour, etype), so the
    final state equals the batch contingency under ANY arrival order.
    Emits one update row per (cell, trigger)."""
    import pandas as pd

    keyed = stream.select(
        F.expr(f"(unix_timestamp({ts_col}) % 86400) div 3600").alias("hour"),
        F.col(type_col).alias("etype"),
    )

    def kernel(key, pdf_iter, state):
        n = 0
        if state.exists:
            (n,) = (int(v) for v in state.get)
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame(
            {"hour": [key[0]], "etype": [key[1]], "obs": [n]}
        )

    return keyed.groupBy("hour", "etype").applyInPandasWithState(
        kernel,
        outputStructType="hour long, etype string, obs long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_hour_type_stream_once(
    spark: SparkSession, points_dir: str, checkpoint: str
) -> DataFrame:
    """Drive the streaming contingency over all staged files and finish
    with the batch ``hour_type_mix`` marginal/residual algebra —
    byte-identical output schema and values."""
    schema = spark.read.parquet(points_dir).schema
    st = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(points_dir)
    )
    name = f"htmix_stream_{abs(hash(points_dir)) % 10**8}"
    q = (
        stream_hour_type_counts(st)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"""
        WITH fin AS (
          SELECT hour, etype, obs,
                 row_number() OVER (PARTITION BY hour, etype
                                    ORDER BY obs DESC) AS rk
          FROM {name}
        ),
        obs AS (SELECT hour, etype, obs FROM fin WHERE rk = 1),
        mh AS (SELECT hour, sum(obs) AS n_hour FROM obs GROUP BY 1),
        mt AS (SELECT etype, sum(obs) AS n_type FROM obs GROUP BY 1),
        tot AS (SELECT sum(obs) AS n_total FROM obs)
        SELECT o.hour, o.etype, CAST(o.obs AS BIGINT) AS obs,
               CAST(mh.n_hour AS BIGINT) AS n_hour,
               CAST(mt.n_type AS BIGINT) AS n_type,
               CAST(o.obs * t.n_total - mh.n_hour * mt.n_type AS BIGINT)
                 AS res_num,
               CAST(t.n_total AS BIGINT) AS res_den
        FROM obs o
        JOIN mh ON mh.hour = o.hour
        JOIN mt ON mt.etype = o.etype
        CROSS JOIN tot t
        """
    )

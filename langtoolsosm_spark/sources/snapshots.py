"""Iceberg-style snapshot table: immutable parquet data files + JSON
manifests, with per-partition lineage and resumable commits.

The reference's write transaction is the OSM changeset: opened lazily,
closed every ``batch`` edits, with a comment suffix `` (part N)`` and
running edit counters (/root/reference/src/fill_empty_name.py:66-89;
lib/osm_utils.py:155-165). The engine maps that to snapshot commits: each
micro-batch of partition outputs is one snapshot carrying metadata tags
(comment/source/created_by) in its summary, a monotonically increasing id,
and a lineage list (partition id -> rows, duration). Resume = skip
partitions already recorded in the latest snapshot chain
(BASELINE.json:north_rule "resumable from checkpoint with per-partition
lineage + metrics").

No Iceberg jars exist in the sandbox, so the manifest format is a trivial
JSON chain — same semantics (immutable data files, named snapshots,
time-travel by snapshot id, append/overwrite), engine-owned.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotTable:
    """A directory of immutable parquet files + snapshots/NNNNNN.json."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.snap_dir = os.path.join(path, "snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- snapshot chain -----------------------------------------------------

    def snapshots(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.snap_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.snap_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def current(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def committed_partitions(self) -> set[int]:
        """Union of partition ids recorded across the live snapshot chain."""
        done: set[int] = set()
        for s in self.snapshots():
            if s.get("operation") == "overwrite":
                done = set()
            for rec in s.get("lineage", []):
                done.add(rec["partition_id"])
        return done

    def live_files(self, snapshot_id: int | None = None) -> list[str]:
        files: list[str] = []
        for s in self.snapshots():
            if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
                break
            if s.get("operation") == "overwrite":
                files = []
            files.extend(s["files"])
        return [os.path.join(self.data_dir, f) for f in files]

    # -- commit -------------------------------------------------------------

    def commit(
        self,
        files: list[str],
        lineage: list[dict],
        summary: dict | None = None,
        operation: str = "append",
    ) -> dict:
        """Record a snapshot over data files already placed in data_dir.

        files: basenames inside data_dir. lineage: one dict per partition
        {partition_id, rows, duration_ms}. summary: changeset-style
        metadata tags (comment / source / created_by ...).
        """
        prev = self.current()
        sid = (prev["snapshot_id"] + 1) if prev else 1
        snap = {
            "snapshot_id": sid,
            "parent_id": prev["snapshot_id"] if prev else None,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "files": files,
            "lineage": lineage,
            "summary": dict(summary or {}),
            "total_rows": sum(r.get("rows", 0) for r in lineage),
        }
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.rename(tmp, os.path.join(self.snap_dir, f"{sid:06d}.json"))
        return snap

    def new_data_file(self, partition_id: int) -> str:
        return f"part-{partition_id:05d}-{uuid.uuid4().hex}.parquet"

    # -- spark I/O ------------------------------------------------------------

    def read(self, spark, snapshot_id: int | None = None):
        """Load the table state at a snapshot (default: current)."""
        files = self.live_files(snapshot_id)
        if not files:
            raise FileNotFoundError(f"snapshot table {self.path} is empty")
        return spark.read.parquet(*files)

    # -- manifest-stats file pruning (Iceberg-style) --------------------------

    def pruned_files(
        self, col: str, lo: int, hi: int, snapshot_id: int | None = None
    ) -> list[str]:
        """Live files whose manifest [min, max] stats for ``col`` overlap
        [lo, hi]. Files committed without stats are kept (never prune
        blind). This is the Iceberg manifest-pruning model: a range scan
        opens only matching data files — no footer reads, no list+filter
        over the whole table (SURVEY.md §4 cell-range pruning)."""
        stats: dict[str, tuple] = {}
        live: list[str] = []
        for s in self.snapshots():
            if snapshot_id is not None and s["snapshot_id"] > snapshot_id:
                break
            if s.get("operation") == "overwrite":
                live = []
            live.extend(s["files"])
            for rec in s.get("lineage", []):
                st = rec.get("stats", {}).get(col)
                if rec.get("file") and st is not None:
                    stats[rec["file"]] = (st[0], st[1])
        out = []
        for f in live:
            st = stats.get(f)
            if st is None or (st[0] <= hi and st[1] >= lo):
                out.append(os.path.join(self.data_dir, f))
        return out

    def read_range(self, spark, col: str, lo: int, hi: int,
                   snapshot_id: int | None = None):
        """Range scan over ``col``: manifest-pruned file list + the
        residual predicate (files can straddle the range boundary).

        An empty overlap is a legitimate outcome (range between key
        values, or an overwrite shrank the key space): it returns an
        EMPTY DataFrame with the table schema, read from one live file
        under a false predicate. Only a table with no live files at all
        raises — that is 'missing/corrupt', not 'no rows in range'."""
        from pyspark.sql import functions as F

        files = self.pruned_files(col, lo, hi, snapshot_id)
        if not files:
            live = self.pruned_files(
                col, -(1 << 62), (1 << 62) - 1, snapshot_id
            )
            if not live:
                raise FileNotFoundError(
                    f"snapshot table has no live files at {self.path}"
                )
            return spark.read.parquet(live[0]).filter(F.lit(False))
        return spark.read.parquet(*files).filter(
            (F.col(col) >= lo) & (F.col(col) <= hi)
        )

    # -- maintenance ----------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Expire all but the last ``keep_last`` snapshots and delete data
        files referenced ONLY by expired history — the Iceberg
        ``expire_snapshots`` maintenance op that actually reclaims space
        after compaction (the replace commit keeps old files alive for
        time travel; this drops them).

        The earliest retained snapshot is rewritten SELF-CONTAINED (an
        overwrite carrying its cumulative live-file state), because an
        append-chain snapshot is meaningless without its ancestors. Each
        file keeps its ORIGINAL lineage record (partition id, rows,
        stats) gathered from the expired chain, so manifest-stats pruning
        and ``committed_partitions`` resume bookkeeping survive
        expiration unchanged. Returns counts of removed manifests and
        deleted files."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"removed_snapshots": 0, "deleted_files": 0}
        cutoff = snaps[-keep_last]
        cid = cutoff["snapshot_id"]
        state = [os.path.basename(p) for p in self.live_files(cid)]
        # original lineage record per file (each data file is written by
        # exactly one commit), plus the committed-partition set as of the
        # cutoff (respecting overwrite resets) — file-LESS lineage records
        # (empty partitions) must survive the rewrite too, or
        # committed_partitions() would shrink after expiration
        filerec: dict[str, dict] = {}
        expired_refs: set[str] = set()
        done_at_cutoff: set[int] = set()
        for s in snaps:
            if s["snapshot_id"] <= cid:
                if s.get("operation") == "overwrite":
                    done_at_cutoff = set()
                for rec in s.get("lineage", []):
                    done_at_cutoff.add(rec["partition_id"])
                    if rec.get("file"):
                        filerec[rec["file"]] = rec
            if s["snapshot_id"] < cid:
                expired_refs.update(s["files"])
        retained: set[str] = set(state)
        for s in snaps[-keep_last:]:
            if s["snapshot_id"] > cid:
                retained.update(s["files"])
        file_lineage = [
            filerec.get(
                f, {"partition_id": -1, "rows": 0, "duration_ms": 0, "file": f}
            )
            for f in state
        ]
        covered = {rec["partition_id"] for rec in file_lineage}
        fileless_lineage = [
            {"partition_id": p, "rows": 0, "duration_ms": 0}
            for p in sorted(done_at_cutoff - covered)
        ]
        rewritten = {
            **cutoff,
            "parent_id": None,
            "operation": "overwrite",
            "files": state,
            "lineage": file_lineage + fileless_lineage,
            "summary": {**cutoff.get("summary", {}), "expired-rewrite": True},
            "total_rows": sum(filerec.get(f, {}).get("rows", 0) for f in state),
        }
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(rewritten, f)
        os.rename(tmp, os.path.join(self.snap_dir, f"{cid:06d}.json"))
        removed = 0
        for s in snaps:
            if s["snapshot_id"] < cid:
                os.remove(
                    os.path.join(self.snap_dir, f"{s['snapshot_id']:06d}.json")
                )
                removed += 1
        deleted = 0
        for fn in expired_refs - retained:
            p = os.path.join(self.data_dir, fn)
            if os.path.exists(p):
                os.remove(p)
                deleted += 1
        return {"removed_snapshots": removed, "deleted_files": deleted}


def _require_integral_cols(df, cols, where: str) -> None:
    """Manifest min/max stats are stored as ints; ``int()`` on a float
    truncates toward zero (int(-3.7) -> -3), silently NARROWING the
    recorded range so ``pruned_files``/``read_range`` would skip files
    that contain matching rows. Fail loudly instead."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            raise TypeError(
                f"{where}: stats/cluster column '{c}' must have an integral "
                f"type, got {dt.simpleString()} — float min/max would be "
                "truncated toward zero and the manifest would wrongly prune"
            )


def _zorder_expr(a, b, bits: int = 16):
    """JVM-side Morton interleave of two non-negative integer columns
    (bit b of each lands at 2b / 2b+1): pure shift/and/add expressions,
    whole-stage codegen, no UDF. ``bits`` per dimension (values must fit;
    16 covers tile grids up to res 16)."""
    from pyspark.sql import functions as F

    a, b_ = a.cast("long"), b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b_, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def compact_table(
    table: "SnapshotTable",
    spark,
    target_files: int = 8,
    stats_col: str | None = None,
    zorder_cols: tuple[str, str] | None = None,
    summary: dict | None = None,
    curve: str = "zorder",
) -> dict:
    """Rewrite the table's live files into ``target_files`` larger ones as
    one replace commit — the Iceberg ``rewrite_data_files`` maintenance
    op. At 100 TB streaming/batched commits leave thousands of small
    files per partition; scan task count and manifest size both degrade
    until a compaction pass folds them. Content is unchanged (tested
    order-insensitively); old files stay on disk for time travel until
    ``expire_snapshots``.

    Clustering: with ``stats_col`` the rewrite range-clusters on that
    column so its per-file min/max stats get TIGHTER and ``read_range``
    prunes better than before. With ``zorder_cols`` (two non-negative
    integer columns) the rewrite sorts by their Morton interleave —
    Z-ORDER clustering — so pruning improves on BOTH dimensions at once
    (a single-column range cluster makes the other dimension's stats
    useless); stats are recorded for both. The interleave is a pure
    shift/and expression — codegen, no UDF. ``curve="hilbert"`` sorts by
    the Hilbert key instead (operators/spatial.py ``with_hilbert``):
    every range-partitioned file then holds a CONTIGUOUS curve interval,
    and Hilbert intervals are always edge-connected 2-D regions — no
    Z-seam jumps — so per-file min/max boxes are tighter and bbox scans
    prune strictly more files (asserted in tests).

    Distributed: one executor-side parquet write per output partition
    (accumulating the partition's Arrow batches into a single file);
    only manifest bookkeeping is driver-side.

    Like any overwrite, the replace commit resets ``committed_partitions``
    to the compaction's own (synthetic) partition ids — resume bookkeeping
    for a PRIOR interrupted ingest does not survive compaction, so compact
    only completed tables (the standard maintenance-window contract)."""
    from pyspark.sql import functions as F

    df = table.read(spark)
    stats_cols: list[str] = [stats_col] if stats_col else []
    drop_cols: list[str] = []
    if zorder_cols is not None:
        za, zb = zorder_cols
        stats_cols += [c for c in (za, zb) if c not in stats_cols]
    _require_integral_cols(df, stats_cols, "compact_table")
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"curve must be 'zorder' or 'hilbert', got {curve!r}")
    if zorder_cols is not None:
        za, zb = zorder_cols
        if curve == "hilbert":
            from ..operators.spatial import with_hilbert

            keyed = with_hilbert(df, res=16, x_col=za, y_col=zb, out="__z")
        else:
            keyed = df.withColumn("__z", _zorder_expr(F.col(za), F.col(zb)))
        part = keyed.repartitionByRange(target_files, F.col("__z")).sortWithinPartitions(
            "__z"
        )
        drop_cols = ["__z"]
    elif stats_col is not None:
        part = df.repartitionByRange(target_files, F.col(stats_col))
    else:
        part = df.repartition(target_files)
    data_dir = table.data_dir

    def _rewrite(batches):
        import json as _json

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pqw
        import time as _t
        import uuid as _u

        t0 = _t.time()
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if drop_cols:
            pdf = pdf.drop(columns=drop_cols)
        fn = f"compact-{_u.uuid4().hex}.parquet"
        pqw.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(data_dir, fn),
            row_group_size=8192,
        )
        stats = {c: [int(pdf[c].min()), int(pdf[c].max())] for c in stats_cols}
        yield pd.DataFrame(
            {
                "file": [fn],
                "rows": [len(pdf)],
                "duration_ms": [int((_t.time() - t0) * 1000)],
                "stats_json": [_json.dumps(stats)],
            }
        )

    manifest = part.mapInPandas(
        _rewrite, schema="file string, rows long, duration_ms long, stats_json string"
    )
    recs = [r.asDict() for r in manifest.collect()]
    lineage = []
    for i, r in enumerate(recs):
        rec = {
            "partition_id": i,
            "rows": r["rows"],
            "duration_ms": r["duration_ms"],
            "file": r["file"],
        }
        stats = json.loads(r["stats_json"])
        if stats:
            rec["stats"] = stats
        lineage.append(rec)
    s = dict(summary or {})
    s.setdefault("comment", "compaction")
    return table.commit(
        files=[r["file"] for r in recs],
        lineage=lineage,
        summary=s,
        operation="overwrite",
    )


def write_partitioned(
    df,
    table: SnapshotTable,
    partition_col: str,
    summary: dict | None = None,
    batch_partitions: int = 0,
    skip_partitions: set[int] | None = None,
    stats_col: str | None = None,
) -> list[dict]:
    """Write a DataFrame as snapshot commits batched by partition groups.

    Mirrors reference changeset batching: ``batch_partitions`` partitions
    per snapshot (0 = all in one), `` (part N)`` comment suffix, resumable
    via ``skip_partitions`` (from ``table.committed_partitions()``).

    ``stats_col`` (an integer column, e.g. the tile key) records per-file
    min/max in the manifest lineage so ``read_range`` can prune files
    without touching them — the Iceberg manifest-stats model.

    The write itself is distributed (one pass, hash-partitioned by
    ``partition_col``); only manifest bookkeeping is driver-side.
    """
    skip = skip_partitions or set()
    if stats_col is not None:
        _require_integral_cols(df, [stats_col], "write_partitioned")
    data_dir = table.data_dir

    def _write_partition(pid_iter):
        # executor-side: write one parquet file per spark partition
        import pyarrow as pa  # re-import inside task
        import pyarrow.parquet as pqw
        import time as _t
        import uuid as _u

        for pdf in pid_iter:
            if len(pdf) == 0:
                continue
            t0 = _t.time()
            pid = int(pdf["__pid"].iloc[0])
            if pid in skip:
                continue
            fn = f"part-{pid:05d}-{_u.uuid4().hex}.parquet"
            tbl = pa.Table.from_pandas(pdf.drop(columns=["__pid"]), preserve_index=False)
            pqw.write_table(tbl, os.path.join(data_dir, fn))
            smin = int(pdf[stats_col].min()) if stats_col else None
            smax = int(pdf[stats_col].max()) if stats_col else None
            yield pa.RecordBatch.from_pydict(
                {
                    "partition_id": [pid],
                    "file": [fn],
                    "rows": [len(pdf)],
                    "duration_ms": [int((_t.time() - t0) * 1000)],
                    "stat_min": [smin],
                    "stat_max": [smax],
                }
            ).to_pandas()

    from pyspark.sql import functions as F

    with_pid = df.withColumn("__pid", F.abs(F.hash(F.col(partition_col))))
    manifest_df = with_pid.groupBy("__pid").applyInPandas(
        lambda pdf: next(iter(_write_partition([pdf])), _empty_manifest_pdf()),
        schema="partition_id long, file string, rows long, duration_ms long, "
        "stat_min long, stat_max long",
    )
    recs = [r.asDict() for r in manifest_df.collect() if r["file"] is not None]

    snaps = []
    batch = batch_partitions or len(recs) or 1
    for i in range(0, len(recs), batch):
        chunk = recs[i : i + batch]
        s = dict(summary or {})
        if len(recs) > batch:
            s["comment"] = f"{s.get('comment', '')} (part {i // batch + 1})".strip()

        def _lineage(r: dict) -> dict:
            rec = {
                "partition_id": r["partition_id"],
                "rows": r["rows"],
                "duration_ms": r["duration_ms"],
                "file": r["file"],
            }
            if stats_col is not None and r["stat_min"] is not None:
                rec["stats"] = {stats_col: [r["stat_min"], r["stat_max"]]}
            return rec

        snaps.append(
            table.commit(
                files=[r["file"] for r in chunk],
                lineage=[_lineage(r) for r in chunk],
                summary=s,
            )
        )
    return snaps


def _empty_manifest_pdf():
    import pandas as pd

    return pd.DataFrame(
        {"partition_id": pd.Series([], dtype="int64"), "file": pd.Series([], dtype="object"),
         "rows": pd.Series([], dtype="int64"), "duration_ms": pd.Series([], dtype="int64"),
         "stat_min": pd.Series([], dtype="int64"), "stat_max": pd.Series([], dtype="int64")}
    )

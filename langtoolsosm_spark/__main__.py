"""spark-submit entry point (BASELINE.json:north_rule "run via
spark-submit --py-files on a multi-executor cluster"):

    # local dev
    python -m langtoolsosm_spark --job flagship --synth-dir data/synth_sf0.001 --out /tmp/flag

    # cluster (master/memory/executors come from spark-submit; the
    # session factory skips its local[] defaults under --cluster)
    zip -r ltos.zip langtoolsosm_spark
    spark-submit --py-files ltos.zip langtoolsosm_spark/__main__.py \
        --cluster --job ingest --synth-dir s3://…/synth --out s3://…/table

Jobs:
  flagship   enrichment pipeline (tile + PIP ownership + kNN captions)
             written to parquet
  ingest     the north-star benched job: decode/verify -> tile assign ->
             unique PIP ownership -> snapshot write with lineage
             (resumable; prints the metrics dict as one JSON line)
  snapshot   flagship -> snapshot table commit (resumable)
  compact    snapshot maintenance: rewrite live files (optionally
             Z-order/Hilbert clustered), then expire old snapshots
  query      run one registry query by name against --sf-dir and write
             parquet (the driver-contract surface, batch-launchable)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="langtoolsosm_spark")
    ap.add_argument("--job", required=True,
                    choices=["flagship", "ingest", "snapshot", "compact", "query"])
    ap.add_argument("--synth-dir", help="synthetic fixture dir (image jobs)")
    ap.add_argument("--sf-dir", help="TPC-H-ish parquet dir (query job)")
    ap.add_argument("--out", help="output path (parquet dir or snapshot table)")
    ap.add_argument("--name", help="registry query name (query job)")
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--target-files", type=int, default=8)
    ap.add_argument("--zorder-cols", help="comma pair, e.g. tile,iy")
    ap.add_argument("--curve", default="zorder", choices=["zorder", "hilbert"])
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--cluster", action="store_true",
                    help="do not force local[] master (spark-submit owns it)")
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark("ltos-" + args.job, cluster=args.cluster)
    if args.job == "flagship":
        from .plans.pipeline import flagship

        df = flagship(spark, args.synth_dir, res=args.res)
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"job": "flagship", "rows": spark.read.parquet(args.out).count()}))
    elif args.job == "ingest":
        from .plans.pipeline import run_ingest

        m = run_ingest(spark, args.synth_dir, args.out, res=args.res,
                       replicate=args.replicate, dry_run=args.dry_run)
        print(json.dumps(m, default=str))
    elif args.job == "snapshot":
        from .plans.pipeline import run_to_snapshot

        m = run_to_snapshot(spark, args.synth_dir, args.out, res=args.res,
                            replicate=args.replicate, dry_run=args.dry_run)
        print(json.dumps(m, default=str))
    elif args.job == "compact":
        from .sources.snapshots import SnapshotTable, compact_table

        t = SnapshotTable(args.out)
        zc = tuple(args.zorder_cols.split(",")) if args.zorder_cols else None
        m = compact_table(t, spark, target_files=args.target_files,
                          zorder_cols=zc, curve=args.curve)
        e = t.expire_snapshots()
        print(json.dumps({"compact": m, "expire": e}, default=str))
    elif args.job == "query":
        from .plans.driver_queries import REGISTRY

        if args.name not in REGISTRY:
            print(f"unknown query {args.name!r}; registry has {len(REGISTRY)}",
                  file=sys.stderr)
            return 2
        fn = REGISTRY[args.name][0]
        df = fn(spark, args.sf_dir)
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"job": "query", "name": args.name,
                          "rows": spark.read.parquet(args.out).count()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

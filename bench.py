"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship geospatial pipeline (cell encode -> PIP join -> tile
ownership -> kNN enrich -> snapshot write) is the north-star number
(BASELINE.json: images/sec); the per-query map covers the other operator
families at the bench tier.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tile_assign",
    "pip_join",
    "pip_unique_owner",
    "knn_join",
    "cell_histogram",
    "agg_pushdown",
    "topk_window",
    "minhash_signatures",
    "embedding_topk",
    "dedup_exact",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from langtoolsosm_spark.datagen import ensure_dataset, tier_for_sf_dir
    from langtoolsosm_spark.plans.driver_queries import REGISTRY
    from langtoolsosm_spark.plans.pipeline import run_to_snapshot
    from langtoolsosm_spark.session import get_spark

    tier = tier_for_sf_dir(sf_dir)
    synth = ensure_dataset(tier)

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))

    timings: dict[str, float] = {}

    # flagship pipeline (north-star: images/sec through PIP + tiling)
    out_dir = tempfile.mkdtemp(prefix="bench_snap_")
    try:
        t0 = time.time()
        metrics = run_to_snapshot(
            spark, synth, os.path.join(out_dir, "t"), res=8, with_knn=True, resume=False
        )
        timings["flagship_pipeline"] = round(time.time() - t0, 3)
        images_per_sec = metrics["rows_per_sec"]
        n_images = metrics["rows"]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    for name in HEADLINE:
        fn, _oracle = REGISTRY[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "images_per_sec": round(images_per_sec, 1),
        "flagship_images": n_images,
        "cpus": cpus,
    }
    # attach the latest N-vs-4N scaling evidence (bench_scaling.py writes
    # BENCH/BASELINE.md; the JSON sidecar carries the machine numbers)
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(side):
        try:
            with open(side) as f:
                sc = json.load(f)
            out["scaling"] = {
                "lo_cores": sc["lo"]["cores"],
                "hi_cores": sc["hi"]["cores"],
                "lo_images_per_sec": sc["lo"]["rows_per_sec"],
                "hi_images_per_sec": sc["hi"]["rows_per_sec"],
                "efficiency": sc["scaling_efficiency"],
                "outputs_identical": sc["outputs_identical"],
            }
        except Exception:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()

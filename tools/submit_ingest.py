"""spark-submit entry point for the north-star ingest job.

Usage (the --py-files deployment contract from BASELINE.json:north_star):

    cd /root/repo && zip -qr /tmp/engine.zip langtoolsosm_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        tools/submit_ingest.py sf0.001 /tmp/ingest_out [replicate]

The script imports the engine ONLY from the shipped zip (sys.path has the
--py-files archive first), runs decode-verify -> tile -> PIP -> snapshot
write, and prints one JSON metrics line.
"""

import json
import sys

from pyspark.sql import SparkSession


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ingest_out"
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from langtoolsosm_spark.datagen import ensure_dataset
    from langtoolsosm_spark.plans.pipeline import run_ingest

    synth = ensure_dataset(tier)
    metrics = run_ingest(spark, synth, out, res=8, replicate=replicate)
    print(json.dumps({"tier": tier, **{k: v for k, v in metrics.items() if k != "snapshots"}}))


if __name__ == "__main__":
    main()

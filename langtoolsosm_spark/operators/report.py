"""Report export/import round-trip (SURVEY.md §3.3).

Reference: write_osm_objects_report emits a tab-separated unix-dialect CSV
with a ``# ``-prefixed metadata first row (src/write_osm_objects_report.py:
155-177); update_osm_objects_from_report re-ingests it with
``skiprows=1`` + subset schema validation (src/update_osm_objects_from_
report.py:49-68), projects the upload columns with NaN-drop (:87-88) and
CDC-merges against current objects (:117-131).

Engine: Spark CSV writer can't emit a comment row, so metadata goes to a
``_meta.json`` sidecar; the reader accepts both layouts (``comment='#'``
skips a metadata row if present)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_report(df: DataFrame, path: str, metadata: dict | None = None) -> None:
    """TSV report sink + metadata sidecar. Single file per partition dir
    (reports are human-scale; coalesce(1) keeps the reference's one-file
    contract without a driver collect)."""
    df.coalesce(1).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).option("emptyValue", "").csv(path)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(metadata or {}, f)


def read_report(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """TSV report source (reference pd.read_table skiprows=1)."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("comment", "#")
        .csv(path)
    )
    meta = {}
    meta_path = os.path.join(path, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return df, meta


def validate_upload_columns(df: DataFrame, upload_tags: list[str]) -> None:
    """Subset validation (src/update_osm_objects_from_report.py:62-68)."""
    missing = set(upload_tags).difference(df.columns)
    if missing:
        raise ValueError(
            f"upload tags missing from report columns: {sorted(missing)}"
        )


def report_to_edits(df: DataFrame, upload_tags: list[str]) -> DataFrame:
    """Project upload columns, drop nulls (reference dropna :87-88), emit
    (osm_type, id, key, value) edit rows."""
    validate_upload_columns(df, upload_tags)
    stacked = None
    for tag in upload_tags:
        part = df.select(
            F.col("osm_type"),
            F.col("id").cast("long").alias("id"),
            F.lit(tag).alias("key"),
            F.col(tag).alias("value"),
        ).filter(F.col(tag).isNotNull() & (F.col(tag) != ""))
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked


def build_report(
    features: DataFrame,
    lang: str,
    extra_tags: list[str] = (),
    coords: bool = False,
) -> DataFrame:
    """Wide report projection (src/write_osm_objects_report.py:50-69
    header assembly with dedup; :77-148 row assembly). Columns: type/id,
    name, name:{lang}, extra tags, multilang names, all_tags; optional
    lat/lon (the ``--coords`` centroid mode, lib/osm_utils.py:45-48)."""
    dst = f"name:{lang}"
    cols = ["name", dst, *dict.fromkeys(extra_tags)]  # ordered dedup (:62-69)
    sel = [
        F.col("osm_type"),
        F.col("id"),
        *[F.element_at("tags", F.lit(c)).alias(c) for c in cols],
        F.array_join(
            F.array_sort(
                F.map_values(
                    F.map_filter(
                        F.col("tags"),
                        lambda k, v: k.startswith("name:")
                        | k.isin("int_name", "loc_name", "short_name", "official_name"),
                    )
                )
            ),
            ", ",
        ).alias("multilang_names"),
        F.array_join(F.array_sort(F.map_keys("tags")), ", ").alias("all_tags"),
    ]
    if coords:
        sel += [F.col("lat").alias("latitude"), F.col("lon").alias("longitude")]
    return features.select(*sel)

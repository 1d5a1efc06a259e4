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


def write_report_mediawiki(
    df: DataFrame, path: str, table_name: str = "", metadata: dict | None = None
) -> None:
    """MediaWiki-table report sink (src/write_osm_objects_report.py:164-173
    and src/translate_with_wikidata.py:25-38 use pytablewriter's
    MediaWikiTableWriter; the engine emits the same dialect):

        {| class="wikitable"
        |+table_name
        ! col ...
        |-
        | cell ...
        |}

    Rows are formatted as multi-line blocks JVM-side (concat_ws — no
    driver collect), deterministically ordered by the first two columns,
    and written as one text file (reports are human-scale, same contract
    as the TSV sink). Metadata goes to the ``_meta.json`` sidecar."""
    spark = df.sparkSession
    cols = df.columns
    body_line = F.concat_ws(
        "\n",
        F.lit("|-"),
        *[
            F.concat(F.lit("| "), F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in cols
        ],
    )
    body = df.select(
        F.lit(1).alias("__sec"),
        F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols[:2]]
        ).alias("__key"),
        body_line.alias("line"),
    )
    head_text = '{| class="wikitable"\n|+' + table_name + "\n" + "\n".join(
        f"! {c}" for c in cols
    )
    frame_schema = "__sec int, __key string, line string"
    head = spark.createDataFrame([(0, "", head_text)], frame_schema)
    foot = spark.createDataFrame([(2, "", "|}")], frame_schema)
    (
        head.unionByName(body)
        .unionByName(foot)
        .coalesce(1)
        .sortWithinPartitions("__sec", "__key")
        .select("line")
        .write.mode("overwrite")
        .text(path)
    )
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(metadata or {}, f)


def read_report_mediawiki(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """MediaWiki-table report source
    (src/update_osm_objects_from_report.py:51-54 loads via pytablereader's
    MediaWikiTableFileLoader into a pandas frame; the engine parses the
    same dialect). Reports are human-scale single files — like the
    reference's loader, parsing is local, then the frame is distributed."""
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    lines: list[str] = []
    for fn in files:
        with open(fn) as f:
            lines.extend(f.read().splitlines())
    headers = [ln[2:] for ln in lines if ln.startswith("! ")]
    rows: list[list[str]] = []
    cur: list[str] | None = None
    table_name = ""
    for ln in lines:
        if ln.startswith("|+"):
            table_name = ln[2:]
        elif ln == "|-":
            if cur:
                rows.append(cur)
            cur = []
        elif ln == "|}":
            if cur:
                rows.append(cur)
            cur = None
        elif cur is not None and (ln.startswith("| ") or ln == "|"):
            cur.append(ln[2:] if len(ln) > 1 else "")
    schema = ", ".join(f"`{h}` string" for h in headers)
    df = spark.createDataFrame([tuple(r) for r in rows], schema)
    meta = {}
    meta_path = os.path.join(path, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.setdefault("table_name", table_name)
    return df, meta


def mediawiki_wikidata_link(col: F.Column) -> F.Column:
    """``Qnnn`` -> ``[https://www.wikidata.org/wiki/Qnnn Qnnn]``
    (src/write_osm_objects_report.py:125-126)."""
    return F.when(
        col.isNotNull() & (col != ""),
        F.concat(F.lit("[https://www.wikidata.org/wiki/"), col, F.lit(" "), col, F.lit("]")),
    ).otherwise(col)


def mediawiki_osm_template(type_col: F.Column, id_col: F.Column) -> F.Column:
    """``{{node|123}}`` object template
    (src/write_osm_objects_report.py:130, translate_with_wikidata.py:31)."""
    return F.concat(F.lit("{{"), type_col, F.lit("|"), id_col.cast("string"), F.lit("}}"))


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


def footprint_centroid(
    df: DataFrame,
    ring_col: str = "footprint",
    lat_out: str = "latitude",
    lon_out: str = "longitude",
) -> DataFrame:
    """Coords projection mode (lib/osm_utils.py:45-48 ``out center`` /
    SURVEY.md §2.1 projection row): per-row area centroid of a footprint
    polygon, as two appended columns.

    Vectorized NumPy shoelace kernel over Arrow batches
    (functions/geo.py:rings_centroid): rings are padded per-batch by
    repeating the first vertex (degenerate edges add exact zeros), so one
    (B, M) matrix pass computes every centroid — no per-row Python
    geometry."""
    import numpy as np
    import pandas as pd

    from ..functions.geo import rings_centroid

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rings = pdf[ring_col]
            m = max(max(len(r) for r in rings), 1)
            b = len(pdf)
            # zero-fill, not np.empty: an empty ring must not read
            # uninitialized memory (it gets a NaN centroid below)
            lat2d = np.zeros((b, m), dtype=np.float64)
            lon2d = np.zeros((b, m), dtype=np.float64)
            empty = np.zeros(b, dtype=bool)
            for r_i, ring in enumerate(rings):
                n = len(ring)
                if n == 0:
                    empty[r_i] = True
                    continue
                lat2d[r_i, :n] = [v["lat"] for v in ring]
                lon2d[r_i, :n] = [v["lon"] for v in ring]
                lat2d[r_i, n:] = lat2d[r_i, 0]
                lon2d[r_i, n:] = lon2d[r_i, 0]
            clat, clon = rings_centroid(lat2d, lon2d)
            if empty.any():
                clat = np.where(empty, np.nan, clat)
                clon = np.where(empty, np.nan, clon)
            out = pdf.copy()
            out[lat_out] = clat
            out[lon_out] = clon
            yield out

    return df.mapInPandas(
        kernel, schema=f"{out_fields}, `{lat_out}` double, `{lon_out}` double"
    )


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

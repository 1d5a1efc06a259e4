"""Image plumbing, report round-trip, snapshot layer tests."""

import os

import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.operators import images as im
from langtoolsosm_spark.operators import report as rep
from langtoolsosm_spark.operators import translate as tr
from langtoolsosm_spark.sources.snapshots import SnapshotTable, write_partitioned


@pytest.fixture(scope="module")
def images(spark, synth_dir):
    return spark.read.parquet(f"{synth_dir}/images.parquet")


def test_decode_stats_all_formats(spark, images):
    sub = images.limit(400)
    stats = im.decode_stats(sub).toPandas()
    assert len(stats) == 400
    assert set(stats["fmt"]) == {"raw", "bmp", "png", "dctq"}
    assert stats["shape_ok"].all()
    # stored phash was computed on ORIGINAL pixels: lossless must match
    lossless = stats[stats["fmt"] != "dctq"]
    assert (lossless["phash_dist"] == 0).all()
    # lossy stays perceptually near
    assert (stats[stats["fmt"] == "dctq"]["phash_dist"] <= 8).all()


def test_transcode_preserves_caption_and_pixels(spark, images):
    sub = images.filter(F.col("fmt") == "png").limit(50)
    out = im.transcode(sub, "bmp")
    joined = (
        sub.select("image_id", F.col("caption").alias("c0"), F.col("phash").alias("p0"))
        .join(out, "image_id")
        .select("c0", "caption", "p0", "phash")
        .collect()
    )
    assert len(joined) == 50
    for r in joined:
        assert r["caption"] == r["c0"]  # caption byte-equality end to end
        assert r["phash"] == r["p0"]  # lossless transcode: identical pixels


def test_thumbnail_shape(spark, images):
    t = im.thumbnail_gray(images.limit(20), size=8).toPandas()
    assert (t["thumb"].map(len) == 64).all()


def test_report_roundtrip(spark, synth_dir, tmp_path):
    features = spark.read.parquet(f"{synth_dir}/features.parquet")
    report = rep.build_report(features, "ca", extra_tags=["wikidata"], coords=True)
    path = str(tmp_path / "report")
    rep.write_report(report, path, metadata={"comment": "test report", "lang": "ca"})
    back, meta = rep.read_report(spark, path)
    assert meta["comment"] == "test report"
    assert back.count() == features.count()
    # subset validation errors on missing col
    with pytest.raises(ValueError):
        rep.validate_upload_columns(back, ["nonexistent_col"])
    # ingest edits and CDC-merge them (round trip: values came from the
    # same table, so everything is skip-if-equal except null-dropped rows)
    edits = rep.report_to_edits(
        back.withColumnRenamed("name:ca", "name_ca").withColumnRenamed("name_ca", "name:ca"),
        ["name:ca"],
    )
    merged = tr.cdc_merge(features, edits)
    assert merged.filter(F.col("changed")).count() == 0  # pure no-op merge
    assert merged.count() == features.count()


def test_report_mediawiki_roundtrip(spark, synth_dir, tmp_path):
    """MediaWiki sink -> source round-trip, incl. the reference's link
    templating (wikidata [url label], {{type|id}} object templates)."""
    features = spark.read.parquet(f"{synth_dir}/features.parquet")
    report = rep.build_report(features, "ca", extra_tags=["wikidata"])
    linked = report.select(
        rep.mediawiki_osm_template(F.col("osm_type"), F.col("id")).alias("object"),
        "osm_type",
        "id",
        "name",
        F.col("`name:ca`"),
        rep.mediawiki_wikidata_link(F.col("wikidata")).alias("wikidata"),
        "multilang_names",
        "all_tags",
    )
    path = str(tmp_path / "mw_report")
    rep.write_report_mediawiki(
        linked, path, table_name="test table", metadata={"lang": "ca"}
    )
    back, meta = rep.read_report_mediawiki(spark, path)
    assert meta["lang"] == "ca"
    assert meta["table_name"] == "test table"
    assert back.columns == linked.columns
    assert back.count() == features.count()
    # cell-level fidelity: stringified original == parsed (nulls -> '')
    orig = linked.select(
        *[F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("")).alias(c) for c in linked.columns]
    )
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    # templates survive the trip
    row = back.filter(F.col("wikidata") != "").limit(1).collect()[0]
    assert row["object"].startswith("{{") and row["object"].endswith("}}")
    assert row["wikidata"].startswith("[https://www.wikidata.org/wiki/")


def test_snapshot_write_resume(spark, images, tmp_path):
    from langtoolsosm_spark.operators.tiling import assign_tiles

    table = SnapshotTable(str(tmp_path / "snap"))
    df = assign_tiles(images.select("image_id", "lat", "lon"), res=6)
    snaps = write_partitioned(
        df, table, "tile", summary={"comment": "tiles", "created_by": "engine"},
        batch_partitions=4,
    )
    assert len(snaps) >= 2  # changeset-style multi-part commit
    assert "(part 1)" in snaps[0]["summary"]["comment"]
    total = sum(s["total_rows"] for s in snaps)
    assert total == df.count()
    # read back current state
    back = table.read(spark)
    assert back.count() == df.count()
    # lineage recorded per partition
    done = table.committed_partitions()
    assert len(done) == df.select("tile").distinct().count()
    # resume: skipping committed partitions writes nothing new
    snaps2 = write_partitioned(df, table, "tile", skip_partitions=done)
    assert sum(s["total_rows"] for s in snaps2) == 0
    assert table.read(spark).count() == df.count()


def test_image_palette_matches_numpy(spark, images):
    """Kernel vs a direct per-image NumPy recount (independent of the
    kernel's bincount path), across ALL four formats — lossless formats
    must agree bit-for-bit with their decoded pixels, dctq with its own
    decode. Tie-break: first max = smallest color code."""
    import numpy as np
    from collections import Counter
    from langtoolsosm_spark.functions import imagecodec as ic

    sub = images.limit(120)
    got = {r["image_id"]: r for r in im.image_palette(sub, bits=2).collect()}
    for row in sub.select("image_id", "bytes", "fmt").collect():
        px = ic.decode(bytes(row["bytes"]), row["fmt"])
        codes = (
            (px[..., 0].astype(int) >> 6) * 16
            + (px[..., 1].astype(int) >> 6) * 4
            + (px[..., 2].astype(int) >> 6)
        ).ravel()
        c = Counter(codes.tolist())
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        g = got[row["image_id"]]
        assert g["n_px"] == codes.size
        assert g["n_colors"] == len(c)
        assert (g["top_color"], g["top_count"]) == best


def test_image_palette_solid_color(spark):
    """A solid-color image has exactly one palette entry owning every
    pixel."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    px = np.full((5, 7, 3), 200, dtype=np.uint8)  # 200 >> 6 == 3 per channel
    df = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["solid"], "bytes": [ic.encode(px, "raw")], "fmt": ["raw"]}
        )
    )
    [r] = im.image_palette(df, bits=2).collect()
    assert (r["n_px"], r["n_colors"], r["top_color"], r["top_count"]) == (
        35, 1, 3 * 16 + 3 * 4 + 3, 35,
    )


def test_extract_patches_matches_numpy(spark, images):
    """Patch kernel vs a direct per-patch NumPy slice (independent of the
    kernel's reshape/transpose path), across ALL four formats."""
    import numpy as np
    from langtoolsosm_spark.functions import imagecodec as ic

    P = 8
    sub = images.limit(80)
    got = {}
    for r in im.extract_patches(sub, patch=P).collect():
        got[(r["image_id"], r["patch_row"], r["patch_col"])] = r
    n_expected = 0
    for row in sub.select("image_id", "bytes", "fmt").collect():
        px = ic.decode(bytes(row["bytes"]), row["fmt"]).astype(np.int64)
        h, w, _ = px.shape
        for pr in range(h // P):
            for pc in range(w // P):
                n_expected += 1
                blk = px[pr * P:(pr + 1) * P, pc * P:(pc + 1) * P]
                g = got[(row["image_id"], pr, pc)]
                assert g["sum_r"] == blk[..., 0].sum()
                assert g["sum_g"] == blk[..., 1].sum()
                assert g["sum_b"] == blk[..., 2].sum()
                chk = 0
                for rr in range(P):
                    for cc in range(P):
                        for ch in range(3):
                            chk += int(blk[rr, cc, ch]) * (3 * (rr * P + cc) + ch + 1)
                assert g["chk"] == chk
    assert len(got) == n_expected  # sub-patch images contribute nothing


def test_extract_patches_checksum_detects_permutation(spark):
    """Two patches with identical channel sums but swapped pixels must
    get different checksums."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    a = np.zeros((8, 8, 3), dtype=np.uint8)
    a[0, 0] = (10, 20, 30)
    b = np.zeros((8, 8, 3), dtype=np.uint8)
    b[3, 5] = (10, 20, 30)  # same sums, different position
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b"],
                "bytes": [ic.encode(a, "raw"), ic.encode(b, "raw")],
                "fmt": ["raw", "raw"],
            }
        )
    )
    rows = {r["image_id"]: r for r in im.extract_patches(df, patch=8).collect()}
    ra, rb = rows["a"], rows["b"]
    assert (ra["sum_r"], ra["sum_g"], ra["sum_b"]) == (rb["sum_r"], rb["sum_g"], rb["sum_b"])
    assert ra["chk"] != rb["chk"]

    with pytest.raises(ValueError):
        im.extract_patches(df, patch=0)


def test_duplicate_patch_pairs(spark):
    """Three 16x8 images: a and b differ only by small noise (same
    quantized patch sums at both aligned positions), c is far away in
    content. Expect exactly the (a, b) pair with n_shared = 2; with
    min_shared = 3 the pair drops out."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    base = np.full((8, 16, 3), 100, dtype=np.uint8)
    near = base.copy()
    near[2, 3] += 2  # sum moves by 2 within the same >>10 bucket
    far = np.full((8, 16, 3), 220, dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b", "c"],
                "bytes": [ic.encode(x, "raw") for x in (base, near, far)],
                "fmt": ["raw"] * 3,
            }
        )
    )
    got = im.duplicate_patch_pairs(df, patch=8, sum_shift=10, min_shared=2).collect()
    assert [(r["img_a"], r["img_b"], r["n_shared"]) for r in got] == [("a", "b", 2)]
    assert im.duplicate_patch_pairs(df, patch=8, sum_shift=10, min_shared=3).count() == 0


def test_hist_equalize_stats(spark):
    """Two-level image: eq maps the low level to 0 and the top level to
    255 regardless of counts; single-level image maps to 0 (guarded
    divide)."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    two = np.zeros((4, 8, 3), dtype=np.uint8)
    two[:, 4:] = 200  # lum 0 (16 px) and lum 200 (16 px)
    flat = np.full((4, 4, 3), 50, dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["two", "flat"],
                "bytes": [ic.encode(two, "raw"), ic.encode(flat, "raw")],
                "fmt": ["raw", "raw"],
            }
        )
    )
    rows = {
        (r["image_id"], r["level"]): r
        for r in im.hist_equalize_stats(df).collect()
    }
    assert rows[("two", 0)]["cdf"] == 16 and rows[("two", 0)]["eq_level"] == 0
    assert rows[("two", 200)]["cdf"] == 32
    # (32-16)*255 // (32-16) = 255
    assert rows[("two", 200)]["eq_level"] == 255
    assert rows[("flat", 50)]["eq_level"] == 0 and rows[("flat", 50)]["n_px"] == 16


def test_edge_stats_step_edge_and_random(spark):
    """Vertical step edge: gy = 0 everywhere, gx = 4*255 on the two
    columns straddling the step; random image matches a direct per-pixel
    stencil evaluation."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    step = np.zeros((6, 8, 3), dtype=np.uint8)
    step[:, 4:] = 255
    rng = np.random.default_rng(11)
    rand = rng.integers(0, 256, (7, 9, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["step", "rand"],
                "bytes": [ic.encode(step, "raw"), ic.encode(rand, "raw")],
                "fmt": ["raw", "raw"],
            }
        )
    )
    got = {r["image_id"]: r for r in im.edge_stats(df, threshold=160).collect()}
    s = got["step"]
    assert s["sum_gy"] == 0
    # interior cols 1..6; step between c=3 and c=4: gx = 4*255 at c in {3,4}
    assert s["sum_gx"] == 4 * 255 * 4 * 2  # 4 rows x 2 cols x 1020
    assert s["edge_px"] == 8 and s["n_interior"] == 4 * 6

    lum = (2126 * rand[..., 0].astype(np.int64)
           + 7152 * rand[..., 1].astype(np.int64)
           + 722 * rand[..., 2].astype(np.int64)) // 10000
    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    sgx = sgy = nedge = 0
    for r in range(1, 6):
        for c in range(1, 8):
            win = lum[r - 1:r + 2, c - 1:c + 2]
            gx = int((win * sx).sum())
            gy = int((win * sx.T).sum())
            sgx += abs(gx); sgy += abs(gy)
            nedge += abs(gx) + abs(gy) >= 160
    g = got["rand"]
    assert (g["sum_gx"], g["sum_gy"], g["edge_px"]) == (sgx, sgy, nedge)


def test_block_sums_matches_naive(spark):
    """SAT 4-corner answers equal naive rectangle sums for every derived
    query on a random image."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["img000000042"], "bytes": [ic.encode(px, "raw")], "fmt": ["raw"]}
        )
    )
    lum = (2126 * px[..., 0].astype(np.int64)
           + 7152 * px[..., 1].astype(np.int64)
           + 722 * px[..., 2].astype(np.int64)) // 10000
    rows = im.block_sums(df, queries_per_image=6).collect()
    assert len(rows) == 6
    for r in rows:
        naive = int(lum[r["y0"]:r["y1"] + 1, r["x0"]:r["x1"] + 1].sum())
        assert r["px_sum"] == naive
    with pytest.raises(ValueError):
        im.block_sums(df, queries_per_image=0)


def test_blob_stats_connectivity(spark):
    """4-connectivity: a U-shaped blob is ONE component; two blobs
    touching only diagonally stay separate; all-background images are
    dropped."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    def img(mask):
        px = np.zeros((*mask.shape, 3), dtype=np.uint8)
        px[mask] = 255
        return ic.encode(px, "raw")

    u = np.zeros((5, 5), dtype=bool)
    u[1:4, 1] = True; u[3, 1:4] = True; u[1:4, 3] = True  # U shape
    diag = np.zeros((4, 4), dtype=bool)
    diag[0, 0] = diag[1, 1] = True  # diagonal touch only
    bg = np.zeros((3, 3), dtype=bool)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["u", "diag", "bg"],
                "bytes": [img(u), img(diag), img(bg)],
                "fmt": ["raw"] * 3,
            }
        )
    )
    got = {r["image_id"]: r for r in im.blob_stats(df, threshold=200).collect()}
    assert "bg" not in got and len(got) == 2
    assert (got["u"]["n_blobs"], got["u"]["n_fg"], got["u"]["max_blob"]) == (1, 7, 7)
    assert (got["diag"]["n_blobs"], got["diag"]["max_blob"]) == (2, 1)


def test_augment_checksums_transform_frames(spark):
    """Each op's checksum equals the identity checksum of the
    numpy-transformed array; crop shape follows the id-derived rect."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["img000000011"], "bytes": [ic.encode(px, "raw")], "fmt": ["raw"]}
        )
    )
    got = {r["op"]: r for r in im.augment_checksums(df).collect()}

    def chk(a):
        a = a.astype(np.int64)
        hh, ww = a.shape[:2]
        wgt = (3 * (np.arange(hh)[:, None] * ww + np.arange(ww)[None, :])[..., None]
               + np.arange(3)[None, None, :] + 1)
        return int((a * wgt).sum())

    v = 11
    x0, x1 = sorted(((v * 40503) % 7, (v * 69069) % 7))
    y0, y1 = sorted(((v * 40503) % 5, (v * 69069) % 5))
    assert got["identity"]["chk"] == chk(px)
    assert got["hflip"]["chk"] == chk(px[:, ::-1])
    assert got["vflip"]["chk"] == chk(px[::-1, :])
    assert got["rot180"]["chk"] == chk(px[::-1, ::-1])
    assert got["crop"]["chk"] == chk(px[y0:y1 + 1, x0:x1 + 1])
    assert got["crop"]["n_px"] == (x1 - x0 + 1) * (y1 - y0 + 1)
    assert got["identity"]["n_px"] == 35


def test_image_quality_filters(spark):
    """A flat gray image drops (no edges, no variance, no color); a
    sharp colorful checkerboard keeps; signals match hand computation."""
    import numpy as np
    import pandas as pd
    from langtoolsosm_spark.functions import imagecodec as ic

    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    # 4-px color stripes: strong Sobel response at the boundary (a
    # 1-px checkerboard would sit at Nyquist where the symmetric
    # stencil cancels to zero — deliberately avoided)
    checker = np.zeros((8, 8, 3), dtype=np.uint8)
    checker[:, :4] = (255, 0, 0)
    checker[:, 4:] = (0, 255, 0)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["flat", "chk"],
                "bytes": [ic.encode(flat, "raw"), ic.encode(checker, "raw")],
                "fmt": ["raw", "raw"],
            }
        )
    )
    got = {r["image_id"]: r for r in im.image_quality(df).collect()}
    f = got["flat"]
    assert (f["edge_milli"], f["lum_var"], f["color_milli"], f["keep"]) == (0, 0, 0, 0)
    c = got["chk"]
    # 12 of 36 interior pixels straddle the stripe boundary -> 333
    assert c["keep"] == 1 and c["edge_milli"] == 333 and c["color_milli"] > 100
    lum = (2126 * checker[..., 0].astype(np.int64)
           + 7152 * checker[..., 1].astype(np.int64)
           + 722 * checker[..., 2].astype(np.int64)) // 10000
    n, s1, s2 = 64, int(lum.sum()), int((lum.astype(np.int64) ** 2).sum())
    assert c["lum_var"] == n * s2 - s1 * s1

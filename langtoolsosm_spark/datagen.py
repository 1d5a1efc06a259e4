"""Deterministic synthetic dataset generators (seed-fixed, no external data).

Generates the engine's four fixture tables (FIXTURES.md F1-F4) at scale
tiers matching /root/testdata SFs, cached as parquet under
``<repo>/data/synth_<tier>/``:

* images   — the primary fact table per BASELINE.json:input_hint
  (image_id, bytes, w, h, fmt, caption, phash) + footprint lat/lon.
  ~20% of rows land in one dense "urban" cell so skew handling is
  actually exercised (SURVEY.md §7.3); a few rows sit exactly on polygon
  boundaries (tie-break fixtures).
* polygons — admin/language-region dimension with lang-rule tags; convex +
  concave + nested + shared-edge + sliver shapes.
* features — OSM-style rows (osm_type, id, tags map, lat/lon, version)
  covering every predicate class the reference uses.
* wikidata — translation dimension (labels/aliases/sitelinks/P31).

Generation is one-time, offline, and NOT the engine hot path; per-image
encoding loops here are fine. Everything downstream is Spark-vectorized.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .functions import imagecodec as ic

SEED = 42
REGION = dict(lat0=35.0, lat1=45.0, lon0=-5.0, lon1=10.0)
HOT = dict(lat0=41.35, lat1=41.45, lon0=2.05, lon1=2.25)  # dense urban cell
HOT_FRAC = 0.2

def _default_data_root() -> str:
    """Cache dir for synth datasets: $LTOSM_DATA_ROOT, else <repo>/data,
    else (when the package ships inside a --py-files zip and the repo dir
    isn't real) a per-user cache dir."""
    env = os.environ.get("LTOSM_DATA_ROOT")
    if env:
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(repo_root):
        return os.path.join(repo_root, "data")
    return os.path.join(os.path.expanduser("~"), ".langtoolsosm_spark", "data")


DATA_ROOT = _default_data_root()

TIER_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}

LANGS = ["ca", "es", "fr", "oc"]
PLACES = [
    "Barcelona", "Girona", "Lleida", "Tarragona", "Perpinyà", "València",
    "Andorra la Vella", "Manresa", "Figueres (Alt Empordà)", "Vic",
    "Sabadell", "Terrassa", "Reus", "Tortosa", "Olot (Garrotxa)",
]


# ---------------------------------------------------------------------------
# polygons
# ---------------------------------------------------------------------------

def _box(s, w, n, e):
    return [(s, w), (s, e), (n, e), (n, w)]


def synth_polygons() -> pd.DataFrame:
    """~30 deterministic polygons over the region (FIXTURES.md F3)."""
    polys = []

    def add(pid, name, ring, lang, kind):
        polys.append(
            dict(
                polygon_id=pid,
                name=name,
                tags=[("name", name), ("lang", lang), ("boundary", "administrative"), ("kind", kind)],
                ring=[{"lat": float(a), "lon": float(b)} for a, b in ring],
            )
        )

    # 4x4 admin grid over the region (16 boxes)
    k = 0
    for i in range(4):
        for j in range(4):
            s = 35.0 + i * 2.5
            w = -5.0 + j * 3.75
            add(f"P{k:03d}", f"Admin {i}-{j}", _box(s, w, s + 2.5, w + 3.75), LANGS[(i + j) % 4], "box")
            k += 1
    # hot-cell polygon (urban) — overlaps the dense cell
    add("P100", "Urbs Central", _box(41.3, 2.0, 41.5, 2.3), "ca", "hot")
    # nested pair
    add("P101", "Outer Ring", _box(38.0, 0.0, 40.0, 2.0), "es", "outer")
    add("P102", "Inner Core", _box(38.5, 0.5, 39.5, 1.5), "es", "inner")
    # adjacent boxes sharing an edge at lon=5.0
    add("P103", "West Twin", _box(36.0, 4.0, 37.0, 5.0), "oc", "twin")
    add("P104", "East Twin", _box(36.0, 5.0, 37.0, 6.0), "oc", "twin")
    # triangles
    add("P105", "Delta Sud", [(35.5, 6.0), (35.5, 9.0), (38.0, 6.0)], "fr", "tri")
    add("P106", "Delta Nord", [(42.0, -4.0), (44.5, -4.0), (42.0, -1.0)], "ca", "tri")
    # concave (notched)
    add(
        "P107",
        "Concau",
        [(43.0, 4.0), (43.0, 8.0), (44.8, 8.0), (44.8, 6.5), (43.8, 6.5), (43.8, 5.5), (44.8, 5.5), (44.8, 4.0)],
        "oc",
        "concave",
    )
    # sliver crossing many cells (thin, wide)
    add("P108", "Corredor", _box(40.48, -4.5, 40.52, 9.5), "es", "sliver")
    add("P109", "Litoral", [(39.0, 3.0), (39.0, 5.5), (41.0, 5.5), (41.0, 4.5), (39.8, 4.5), (39.8, 3.0)], "ca", "lshape")
    df = pd.DataFrame(polys)
    return df


# ---------------------------------------------------------------------------
# images
# ---------------------------------------------------------------------------

def synth_images(n: int, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_hot = int(n * HOT_FRAC)
    lat = np.concatenate(
        [
            rng.uniform(HOT["lat0"], HOT["lat1"], n_hot),
            rng.uniform(REGION["lat0"], REGION["lat1"], n - n_hot),
        ]
    )
    lon = np.concatenate(
        [
            rng.uniform(HOT["lon0"], HOT["lon1"], n_hot),
            rng.uniform(REGION["lon0"], REGION["lon1"], n - n_hot),
        ]
    )
    # a few boundary-exact points (tie-break fixtures): on the shared edge
    # lon=5.0 of P103/P104 and on the box edge lat=40.0 of P101
    nb = min(8, n)
    lat[:nb] = np.linspace(36.1, 36.9, nb)
    lon[:nb] = 5.0
    if n > 16:
        lat[8:16] = 40.0
        lon[8:16] = np.linspace(0.1, 1.9, 8)
    perm = rng.permutation(n)
    lat, lon = lat[perm], lon[perm]

    wh = rng.integers(8, 33, size=(n, 2)).astype(np.int32)
    # the image oracles in plans/driver_queries.py unroll bytes with
    # generate_series(0, 3100); every raw payload must fit under that
    # ceiling (raw = 9-byte header + 3*w*h), or oracle pixels would be
    # silently truncated and gates would fail confusingly
    assert 9 + 3 * int(wh.max()) ** 2 <= 3100, "raw image exceeds oracle byte ceiling"
    fmts = np.array(FMTS := ["raw", "bmp", "png", "dctq"])[np.arange(n) % 4]

    recs = []
    for i in range(n):
        w, h = int(wh[i, 0]), int(wh[i, 1])
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 80 * np.sin(yy / 5.0 + i % 7) * np.cos(xx / 4.0 + i % 5)
        noise = rng.normal(0, 10, (h, w, 3))
        px = np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)
        fmt = str(fmts[i])
        buf = ic.encode(px, fmt)
        place = PLACES[i % len(PLACES)]
        caption = f"Vista de {place} — imatge {i:08d} (mostra sintètica) àçñü"
        recs.append(
            dict(
                image_id=f"img{i:09d}",
                bytes=buf,
                w=w,
                h=h,
                fmt=fmt,
                caption=caption,
                phash=np.int64(ic.phash64(px)),
                lat=float(lat[i]),
                lon=float(lon[i]),
            )
        )
    return pd.DataFrame(recs)


# ---------------------------------------------------------------------------
# media (rawseq video + pcm16 audio) — FIXTURES for operators/multimodal.py
# ---------------------------------------------------------------------------

def synth_media(n_video: int = 60, n_audio: int = 40, seed: int = SEED) -> pd.DataFrame:
    """Deterministic multimodal fixture: small rawseq videos (2-8 frames,
    6-16 px sides) and pcm16 audio clips with non-multiple-of-window
    lengths (short final windows are the edge case the features kernel
    must keep). Sizes stay tiny on purpose — the DuckDB oracle re-decodes
    every byte from hex() in SQL, an independent second implementation."""
    from .operators.multimodal import encode_video_rawseq

    rng = np.random.default_rng(seed + 3)
    recs = []
    for i in range(n_video):
        h = int(rng.integers(6, 17))
        w = int(rng.integers(6, 17))
        nf = int(rng.integers(2, 9))
        frames = []
        for f in range(nf):
            yy, xx = np.mgrid[0:h, 0:w]
            # scene phase advances every SECOND frame: consecutive pairs
            # alternate noise-only diffs vs real scene changes, so cut
            # detection has both classes to separate
            base = 128 + 90 * np.sin(yy / 3.0 + f // 2) * np.cos(xx / 4.0 + i % 6)
            noise = rng.normal(0, 12, (h, w, 3))
            frames.append(np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8))
        recs.append(
            dict(media_id=f"vid{i:06d}", kind="video", fmt="rawseq",
                 bytes=encode_video_rawseq(frames))
        )
    for i in range(n_audio):
        n = int(rng.integers(700, 8193))
        x = (3000 * np.sin(np.arange(n) / (4.0 + i % 7))).astype(np.int64)
        x = x + rng.integers(-2000, 2001, n)
        # silence every third 1024-sample window (phase-shifted per clip)
        # so energy-gated VAD segmentation has real islands to find
        silent = ((np.arange(n) // 1024) + i) % 3 == 0
        x[silent] = 0
        x = np.clip(x, -32768, 32767).astype("<i2")
        recs.append(
            dict(media_id=f"aud{i:06d}", kind="audio", fmt="pcm16",
                 bytes=x.tobytes())
        )
    return pd.DataFrame(recs)


# ---------------------------------------------------------------------------
# adversarial image-quality fixtures
# ---------------------------------------------------------------------------

def synth_quality_images() -> pd.DataFrame:
    """Adversarial fixtures for operators/images.py ``image_quality`` —
    textures chosen to pin the Nyquist/Sobel-cancellation lesson
    (NOTES.md, round 5): the symmetric 3x3 Sobel stencil cancels a
    1-px-period checkerboard EXACTLY (every +c/-c tap pair sees equal
    values), so edge detectors must be judged on near-Nyquist (2-px
    period) structure, which does survive the stencil.

    * qlt000000000 nyquist2_color — 2-px-period colored checkerboard:
      must be KEPT (edge_milli well above threshold, high variance,
      high channel spread).
    * qlt000000001 checker1_gray — 1-px checkerboard: edge_milli == 0
      by exact cancellation despite maximal contrast (documented drop).
    * qlt000000002 flat_gray — all signals zero.
    * qlt000000003 ramp_soft — smooth gradient: sub-threshold edges,
      no color (the "blurry" drop case).

    All raw-encoded at 16x16 (3*256 + 9 = 777 bytes, far under the
    oracles' 3100-byte generate_series ceiling asserted in
    ``synth_images``)."""
    recs = []

    def add(i, name, px):
        px = np.ascontiguousarray(px.astype(np.uint8))
        h, w = px.shape[:2]
        recs.append(
            dict(
                image_id=f"qlt{i:09d}",
                bytes=ic.encode(px, "raw"),
                w=np.int32(w),
                h=np.int32(h),
                fmt="raw",
                caption=f"fixture de qualitat — {name}",
                phash=np.int64(ic.phash64(px)),
                lat=41.4,
                lon=2.1,
            )
        )

    yy, xx = np.mgrid[0:16, 0:16]
    blocks = ((yy // 2) + (xx // 2)) % 2 == 0
    add(0, "nyquist2_color",
        np.where(blocks[..., None], np.array([200, 40, 40]), np.array([40, 200, 40])))
    cb = ((yy + xx) % 2 == 0)[..., None]
    add(1, "checker1_gray", np.where(cb, 220, 30) * np.ones((1, 1, 3)))
    add(2, "flat_gray", np.full((16, 16, 3), 128))
    add(3, "ramp_soft", np.repeat((xx * 4)[:, :, None], 3, axis=2))
    # letterbox / pillarbox frames for border detection: uniform bands
    # around a textured center (the classic video-to-image-corpus artifact)
    letter = np.zeros((16, 16, 3), dtype=np.int64)
    letter[3:13] = np.where(blocks[3:13, :, None],
                            np.array([180, 60, 20]), np.array([20, 60, 180]))
    add(4, "letterbox3", letter)
    pillar = np.full((16, 16, 3), 20, dtype=np.int64)
    pillar[:, 2:14] = np.repeat((yy[:, 2:14] * 15)[:, :, None], 3, axis=2)
    add(5, "pillarbox2", pillar)
    return pd.DataFrame(recs)


# bump when synth_quality_images changes: the filename carries the version
# so stale per-machine caches can never be read against newer oracles
_QUALITY_VERSION = 2


def ensure_quality_images(tier: str = "sf0.01", root: str | None = None) -> str:
    """Generate (once) and return the quality-images fixture parquet path
    for a tier (additive next to the core tables, like ``ensure_media``)."""
    out = ensure_dataset(tier, root)
    path = os.path.join(out, f"quality_images_v{_QUALITY_VERSION}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        _write(synth_quality_images(), _IMG_SCHEMA, tmp)
        os.rename(tmp, path)
    return path


# ---------------------------------------------------------------------------
# features (OSM-style) + wikidata dimension
# ---------------------------------------------------------------------------

def synth_features(n: int = 500, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 1)
    lat = rng.uniform(REGION["lat0"], REGION["lat1"], n)
    lon = rng.uniform(REGION["lon0"], REGION["lon1"], n)
    # densify the hot cell with named features too (kNN fixtures)
    n_hot = n // 5
    lat[:n_hot] = rng.uniform(HOT["lat0"], HOT["lat1"], n_hot)
    lon[:n_hot] = rng.uniform(HOT["lon0"], HOT["lon1"], n_hot)
    types = np.array(["node", "way", "relation"])[rng.integers(0, 3, n)]
    recs = []
    for i in range(n):
        place = PLACES[i % len(PLACES)]
        tags: list[tuple[str, str]] = []
        mode = i % 8
        # cover all predicate classes (FIXTURES.md F2)
        if mode in (0, 3, 6, 7):
            tags.append(("name", f"{place} {i}"))
        if mode in (1, 3, 6, 7):
            tags.append(("name:ca", f"{place} ca {i}"))
        if mode in (2, 6):
            tags.append(("name:es", f"{place} es {i}"))
        if mode == 5:
            tags.append(("name", f"Carrer de {place} ({i})"))  # regex target
        if i % 4 == 0:
            tags.append(("wikidata", f"Q{1000 + i % 50}"))  # shared Q-ids
        if i % 5 == 0:
            tags.append(("wikipedia", f"ca:{place}_{i % 20}"))
        if i % 7 == 0:
            tags.append(("int_name", f"{place} intl"))
            tags.append(("official_name", f"Ciutat de {place}"))
        tags.append(("amenity", ["park", "school", "cafe", "museum"][i % 4]))
        recs.append(
            dict(
                osm_type=str(types[i]),
                id=np.int64(10_000 + i),
                tags=tags,
                lat=float(lat[i]),
                lon=float(lon[i]),
                version=np.int32(1 + i % 3),
            )
        )
    return pd.DataFrame(recs)


def synth_wikidata(n: int = 50, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 2)
    recs = []
    for i in range(n):
        qid = f"Q{1000 + i}"
        place = PLACES[i % len(PLACES)]
        has_wiki = i % 3 != 2
        label = None if i % 7 == 6 else f"{place} label {i}"
        aliases = [] if i % 4 == 3 else [f"{place} àlies {j} ({i})" for j in range(i % 3)]
        sitelinks = [("cawiki", f"{place}_{i}"), ("eswiki", f"{place}_es_{i}")]
        if i % 5 == 0:
            sitelinks.append(("commonswiki", f"Category:{place}"))
        p31 = ["human"] if i % 10 == 9 else ["city", "municipality"][: 1 + i % 2]
        recs.append(
            dict(
                wikidata=qid,
                canonical=qid if i % 11 != 10 else f"Q{1000 + (i + 1) % n}",  # redirects
                wikipedia_title=(f"{place} (ciutat) {i}" if has_wiki else None),
                label=label,
                aliases=aliases,
                sitelinks=sitelinks,
                p31_labels=p31,
            )
        )
    return pd.DataFrame(recs)


# ---------------------------------------------------------------------------
# parquet cache
# ---------------------------------------------------------------------------

_IMG_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
    ]
)

_POLY_SCHEMA = pa.schema(
    [
        ("polygon_id", pa.string()),
        ("name", pa.string()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("ring", pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))),
    ]
)

_FEAT_SCHEMA = pa.schema(
    [
        ("osm_type", pa.string()),
        ("id", pa.int64()),
        ("tags", pa.map_(pa.string(), pa.string())),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("version", pa.int32()),
    ]
)

_WD_SCHEMA = pa.schema(
    [
        ("wikidata", pa.string()),
        ("canonical", pa.string()),
        ("wikipedia_title", pa.string()),
        ("label", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("sitelinks", pa.map_(pa.string(), pa.string())),
        ("p31_labels", pa.list_(pa.string())),
    ]
)


def _write(df: pd.DataFrame, schema: pa.Schema, path: str) -> None:
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    # small row groups: parquet parallelism in Spark is per row group — a
    # single-row-group file caps every downstream scan at one task
    pq.write_table(table, path, row_group_size=8192)


def ensure_dataset(tier: str = "sf0.001", root: str | None = None) -> str:
    """Generate (once) and return the synth dataset directory for a tier."""
    if tier not in TIER_ROWS:
        raise ValueError(f"unknown tier {tier}; choose from {sorted(TIER_ROWS)}")
    root = root or DATA_ROOT
    out = os.path.join(root, f"synth_{tier}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    n = TIER_ROWS[tier]
    _write(synth_images(n), _IMG_SCHEMA, os.path.join(tmp, "images.parquet"))
    _write(synth_polygons(), _POLY_SCHEMA, os.path.join(tmp, "polygons.parquet"))
    _write(synth_features(max(500, n // 20)), _FEAT_SCHEMA, os.path.join(tmp, "features.parquet"))
    _write(synth_wikidata(), _WD_SCHEMA, os.path.join(tmp, "wikidata.parquet"))
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump({"tier": tier, "rows": n, "seed": SEED}, f)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    if os.path.exists(out):
        shutil.rmtree(out)
    os.rename(tmp, out)
    return out


_MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),
        ("fmt", pa.string()),
        ("bytes", pa.binary()),
    ]
)


def ensure_media(tier: str = "sf0.01", root: str | None = None) -> str:
    """Generate (once) and return the media.parquet path for a tier.

    Additive next to the core four tables (existing cached dataset dirs
    predate it, so it keys on its own file, not the dir's _SUCCESS
    marker); constant-size per tier like polygons/wikidata."""
    out = ensure_dataset(tier, root)
    path = os.path.join(out, "media.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        _write(synth_media(), _MEDIA_SCHEMA, tmp)
        os.rename(tmp, path)
    return path


_CLUST_EMB_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)


def synth_clustered_embeddings(
    n: int = 2_000,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.25,
    seed: int = SEED,
) -> pd.DataFrame:
    """Mixture-of-Gaussians embedding fixture (unit-norm rows).

    The driver's embeddings table is ~uniform on the sphere — the
    information-theoretic worst case for quantized ANN, so PQ/IVF-PQ
    recall on it carries no regression signal. This fixture is the
    realistic counterpart: ``n_clusters`` unit-norm centers, each point
    ``normalize(center + sigma*N(0,I))``, same schema as the driver's
    embeddings.parquet (vec_id/embedding/label; label = generating
    cluster). Deterministic for a given (n, dim, n_clusters, sigma, seed).
    """
    rng = np.random.RandomState(seed + 7)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.randint(0, n_clusters, size=n)
    pts = centers[lab] + sigma * rng.randn(n, dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in pts],
            "label": lab.astype(np.int32),
        }
    )


def ensure_clustered_embeddings(tier: str = "sf0.01", root: str | None = None) -> str:
    """Generate (once) and return the clustered-embeddings parquet path.

    Additive next to the core tables (keys on its own file, like
    ensure_media). Row count tracks the driver's embeddings table
    (sf0.1 -> 2,000 rows)."""
    out = ensure_dataset(tier, root)
    path = os.path.join(out, "embeddings_clustered.parquet")
    if not os.path.exists(path):
        n = max(500, TIER_ROWS[tier] // 100)
        tmp = path + ".tmp"
        _write(synth_clustered_embeddings(n), _CLUST_EMB_SCHEMA, tmp)
        os.rename(tmp, path)
    return path


def tier_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to a synth tier name."""
    base = os.path.basename(sf_dir.rstrip("/"))
    return base if base in TIER_ROWS else "sf0.01"

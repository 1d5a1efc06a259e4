"""Vectorized geometry kernels — haversine, point-in-polygon, cell cover.

From-scratch NumPy (no shapely in the sandbox; also the no-port mandate).
The reference delegates all geometry to the Overpass server (bbox filter at
/root/reference/lib/osm_utils.py:24-33, area containment at :34-43); the
engine internalizes both as explicit kernels.

Tie-break contract (SURVEY.md §7.3): ray-casting uses the half-open edge
rule ``(y1 <= y < y2) xor (y2 <= y < y1)`` with ``x < x_intersection``, so
a point exactly on a shared horizontal boundary belongs to exactly one of
two edge-adjacent polygons, deterministically. Where a unique assignment is
required downstream (tile ownership), ties are broken by lexicographically
smallest polygon_id.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters; all args broadcastable float64."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def sq_euclid_deg(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Squared Euclidean distance in degrees — the SQL-parity kNN metric.

    Expressible identically in DuckDB oracle SQL: (a-b)^2 + (c-d)^2 with
    plain IEEE-double ops, so ranking comparisons are bit-reproducible
    across engines. (haversine_m is the physical metric; sq_euclid_deg is
    rank-equivalent at small extents and is what the oracle checks.)
    """
    a = np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)
    b = np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)
    return a * a + b * b


def points_in_polygon(lat: np.ndarray, lon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Ray-cast crossing-number PIP: N points vs one closed ring.

    ring: (M, 2) array of (lat, lon) vertices; first==last optional.
    Returns bool (N,). Vectorized over points x edges.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    y1 = ring[:, 0]  # edge start lat
    x1 = ring[:, 1]
    y2 = np.roll(ring[:, 0], -1)
    x2 = np.roll(ring[:, 1], -1)

    py = lat[:, None]  # (N, 1)
    px = lon[:, None]
    cond = ((y1[None, :] <= py) & (py < y2[None, :])) | (
        (y2[None, :] <= py) & (py < y1[None, :])
    )
    # x of edge/ray intersection; guard div-by-zero on horizontal edges
    dy = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / dy[None, :]
    crossings = cond & (px < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_polygon_chunked(
    lat: np.ndarray, lon: np.ndarray, ring: np.ndarray, chunk: int = 65536
) -> np.ndarray:
    """PIP with bounded memory: chunks the N x M crossing matrix."""
    n = len(lat)
    out = np.empty(n, dtype=bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        out[s:e] = points_in_polygon(lat[s:e], lon[s:e], ring)
    return out


def rings_centroid(lat2d: np.ndarray, lon2d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Shoelace (area) centroid of a BATCH of rings, vectorized over rows.

    lat2d/lon2d: (B, M) vertex arrays; rows with fewer than M real
    vertices must be padded by repeating the first vertex (degenerate
    edges contribute exact +0.0 to every term, so padding is free).

    Summation over edges is an explicit in-order accumulation (not
    np.sum's pairwise tree) so the per-edge expression and its order are
    reproducible term-for-term in an external SQL oracle — the parity
    contract used throughout the engine for float kernels.
    """
    y0 = np.asarray(lat2d, dtype=np.float64)
    x0 = np.asarray(lon2d, dtype=np.float64)
    # translate each ring to its first vertex before the shoelace: cross
    # products of raw coordinates (~lat*lon) catastrophically cancel for
    # footprints that are tiny relative to their distance from the origin
    # (hypothesis-found: 3.5e-8 error on a 0.01-degree triangle at lat 34)
    y = y0 - y0[:, :1]
    x = x0 - x0[:, :1]
    xn = np.roll(x, -1, axis=1)
    yn = np.roll(y, -1, axis=1)
    cross = x * yn - xn * y
    b, m = x.shape
    a2 = np.zeros(b)
    sx = np.zeros(b)
    sy = np.zeros(b)
    for i in range(m):  # in-ring order, left-associated
        a2 = a2 + cross[:, i]
        sx = sx + (x[:, i] + xn[:, i]) * cross[:, i]
        sy = sy + (y[:, i] + yn[:, i]) * cross[:, i]
    denom = 3.0 * a2
    with np.errstate(divide="ignore", invalid="ignore"):
        cx = x0[:, 0] + sx / denom
        cy = y0[:, 0] + sy / denom
    # zero-area rings (points/lines) fall back to the first vertex
    bad = ~np.isfinite(cx) | ~np.isfinite(cy) | (a2 == 0.0)
    cx = np.where(bad, x0[:, 0], cx)
    cy = np.where(bad, y0[:, 0], cy)
    return cy, cx


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(south, west, north, east) of a ring array (M,2) of (lat,lon)."""
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def _segments_intersect_boxes(
    ring: np.ndarray, south, west, north, east
) -> np.ndarray:
    """For each cell bbox, does ANY polygon edge intersect it? (conservative
    separating-axis test on edge bbox vs cell bbox, then exact line test).

    south/west/north/east: (C,) arrays. Returns bool (C,).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    ay, ax = ring[:, 0], ring[:, 1]
    by, bx = np.roll(ring[:, 0], -1), np.roll(ring[:, 1], -1)
    # edge bboxes (M,)
    elo_y, ehi_y = np.minimum(ay, by), np.maximum(ay, by)
    elo_x, ehi_x = np.minimum(ax, bx), np.maximum(ax, bx)
    # bbox overlap (C, M)
    ov = (
        (elo_y[None, :] <= north[:, None])
        & (ehi_y[None, :] >= south[:, None])
        & (elo_x[None, :] <= east[:, None])
        & (ehi_x[None, :] >= west[:, None])
    )
    # exact: does the infinite line through the edge separate the box?
    # line: (by-ay)*(x-ax) - (bx-ax)*(y-ay) = 0; box corners all same sign
    # => no intersection with segment (given bbox overlap, mixed sign => hit)
    dy = (by - ay)[None, :]
    dx = (bx - ax)[None, :]

    def side(cy, cx):
        return dy * (cx[:, None] - ax[None, :]) - dx * (cy[:, None] - ay[None, :])

    s1 = side(south, west)
    s2 = side(south, east)
    s3 = side(north, west)
    s4 = side(north, east)
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    hit = ov & ~(all_pos | all_neg)
    return hit.any(axis=1)


def polygon_cell_cover(ring: np.ndarray, res: int):
    """Cover a polygon with grid cells at resolution ``res``.

    Returns (cells, full_inside): int64 cell ids intersecting the polygon
    bbox and actually touching the polygon, plus a bool mask marking cells
    wholly inside (those skip exact PIP refinement — the engine's
    prefilter/refine split, SURVEY.md §4 item 1).
    """
    from .cells import cell_bounds, cell_encode

    ring = np.asarray(ring, dtype=np.float64)
    s, w, n_, e = ring_bbox(ring)
    n = np.int64(1) << res
    ix0 = int(np.clip(np.floor((w + 180.0) / 360.0 * n), 0, n - 1))
    ix1 = int(np.clip(np.floor((e + 180.0) / 360.0 * n), 0, n - 1))
    iy0 = int(np.clip(np.floor((s + 90.0) / 180.0 * n), 0, n - 1))
    iy1 = int(np.clip(np.floor((n_ + 90.0) / 180.0 * n), 0, n - 1))
    xs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    ys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    cells = (np.int64(res) << 58) | (gx.ravel() << 29) | gy.ravel()

    touching, full_inside = classify_cells(ring, cells)
    return cells[touching], full_inside[touching]


def classify_cells(ring: np.ndarray, cells: np.ndarray):
    """Classify an arbitrary array of SAME-resolution cell ids against a
    ring: (touching, full_inside) bool masks. Factored out of
    :func:`polygon_cell_cover` so hierarchical covers (classify only a
    boundary band's children at a finer res) reuse the identical corner/
    edge/vertex tests — cell-local, so a cell classifies the same whether
    it came from a full bbox mesh or a band subdivision."""
    from .cells import cell_bounds, cell_encode

    if len(cells) == 0:
        empty = np.zeros(0, dtype=bool)
        return empty, empty
    res = int(np.asarray(cells)[0] >> 58)
    cs, cw, cn, ce = cell_bounds(cells)
    # corner containment (4 tests)
    in_sw = points_in_polygon(cs, cw, ring)
    in_se = points_in_polygon(cs, ce, ring)
    in_nw = points_in_polygon(cn, cw, ring)
    in_ne = points_in_polygon(cn, ce, ring)
    n_in = (
        in_sw.astype(np.int8) + in_se.astype(np.int8) + in_nw.astype(np.int8) + in_ne.astype(np.int8)
    )
    edge_hit = _segments_intersect_boxes(ring, cs, cw, cn, ce)
    # touching = any corner inside, or an edge crosses the cell, or the cell
    # contains a polygon vertex (covers cells bigger than the polygon)
    vy, vx = ring[:, 0], ring[:, 1]
    vert_cells = cell_encode(vy, vx, res)
    has_vertex = np.isin(cells, vert_cells)
    touching = (n_in > 0) | edge_hit | has_vertex
    full_inside = (n_in == 4) & ~edge_hit & ~has_vertex
    return touching, full_inside

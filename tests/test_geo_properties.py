"""Hypothesis property tests for the geometry kernels (SURVEY.md §5:
property-based invariants alongside the fixture oracles)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from langtoolsosm_spark.functions.geo import (
    points_in_polygon,
    rings_centroid,
)

coord = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(
    lat=coord, lon=coord,
    d=st.floats(min_value=0.01, max_value=5.0, allow_nan=False),
    e=st.floats(min_value=0.01, max_value=5.0, allow_nan=False),
)
def test_triangle_centroid_equals_vertex_mean(lat, lon, d, e):
    """Shoelace centroid of a triangle == mean of its vertices."""
    y = np.array([[lat, lat + d, lat]])
    x = np.array([[lon, lon, lon + e]])
    cy, cx = rings_centroid(y, x)
    assert abs(cy[0] - (lat + (lat + d) + lat) / 3.0) < 1e-9 * max(1.0, abs(lat))
    assert abs(cx[0] - (lon + lon + (lon + e)) / 3.0) < 1e-9 * max(1.0, abs(lon))


@settings(max_examples=200, deadline=None)
@given(
    s=coord, w=coord,
    dh=st.floats(min_value=0.05, max_value=8.0, allow_nan=False),
    dw=st.floats(min_value=0.05, max_value=8.0, allow_nan=False),
)
def test_box_centroid_is_center_and_padding_free(s, w, dh, dw):
    """Box centroid == box center; padding by repeating the first vertex
    must not change the result (degenerate edges contribute exact zeros)."""
    n_, e = s + dh, w + dw
    y = np.array([[s, s, n_, n_]])
    x = np.array([[w, e, e, w]])
    cy, cx = rings_centroid(y, x)
    assert abs(cy[0] - (s + n_) / 2.0) < 1e-8
    assert abs(cx[0] - (w + e) / 2.0) < 1e-8
    yp = np.array([[s, s, n_, n_, s, s]])
    xp = np.array([[w, e, e, w, w, w]])
    cyp, cxp = rings_centroid(yp, xp)
    assert cyp[0] == cy[0] and cxp[0] == cx[0]


@settings(max_examples=200, deadline=None)
@given(
    s=coord, w=coord,
    dh=st.floats(min_value=0.1, max_value=8.0, allow_nan=False),
    dw=st.floats(min_value=0.1, max_value=8.0, allow_nan=False),
    fy=st.floats(min_value=0.0, max_value=1.0, allow_nan=False, exclude_max=True),
    fx=st.floats(min_value=0.0, max_value=1.0, allow_nan=False, exclude_max=True),
)
def test_box_pip_matches_halfopen_rule(s, w, dh, dw, fy, fx):
    """For an axis-aligned box ring, the ray-cast must equal the
    half-open predicate lat in [s, n) x lon in [w, e) — including points
    exactly on every edge and corner."""
    n_, e = s + dh, w + dw
    ring = np.array([[s, w], [s, e], [n_, e], [n_, w]])
    pts = [
        (s + fy * dh, w + fx * dw),  # generic interior-ish point
        (s, w + fx * dw),            # bottom edge -> inside
        (n_, w + fx * dw),           # top edge -> outside
        (s + fy * dh, w),            # left edge -> inside
        (s + fy * dh, e),            # right edge -> outside
        (s, w), (s, e), (n_, w), (n_, e),  # corners
    ]
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    got = points_in_polygon(lat, lon, ring)
    exp = (lat >= s) & (lat < n_) & (lon >= w) & (lon < e)
    assert (got == exp).all()

"""Property tests for geometry kernels: PIP vs brute force, cell cover."""

import numpy as np

from langtoolsosm_spark.functions import cells, geo


RNG = np.random.default_rng(7)

SQUARE = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
TRIANGLE = np.array([[0.0, 0.0], [0.0, 8.0], [8.0, 0.0]])
CONCAVE = np.array(
    [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 6.0], [4.0, 6.0], [4.0, 4.0], [10.0, 4.0], [10.0, 0.0]]
)


def test_square_containment():
    lat = RNG.uniform(-5, 15, 2000)
    lon = RNG.uniform(-5, 15, 2000)
    got = geo.points_in_polygon(lat, lon, SQUARE)
    exp = (lat > 0) & (lat < 10) & (lon > 0) & (lon < 10)
    inner = (np.abs(lat) > 1e-9) & (np.abs(lat - 10) > 1e-9) & (np.abs(lon) > 1e-9) & (np.abs(lon - 10) > 1e-9)
    assert (got[inner] == exp[inner]).all()


def test_triangle_halfplane_oracle():
    lat = RNG.uniform(-1, 9, 2000)
    lon = RNG.uniform(-1, 9, 2000)
    got = geo.points_in_polygon(lat, lon, TRIANGLE)
    # half-plane form: lat>0 & lon>0 & lat+lon<8  (strict interior)
    exp = (lat > 0) & (lon > 0) & (lat + lon < 8)
    border = (np.abs(lat) < 1e-9) | (np.abs(lon) < 1e-9) | (np.abs(lat + lon - 8) < 1e-9)
    assert (got[~border] == exp[~border]).all()


def test_concave_and_ring_closure_tolerated():
    closed = np.vstack([CONCAVE, CONCAVE[:1]])
    lat = np.array([5.0, 5.0, 2.0, 8.0])
    lon = np.array([5.0, 2.0, 5.0, 5.0])
    a = geo.points_in_polygon(lat, lon, CONCAVE)
    b = geo.points_in_polygon(lat, lon, closed)
    assert (a == b).all()
    # the notch spans lat 4..10 at lon in (4,6): (5,5) and (8,5) are in the
    # notch -> outside; (5,2) and (2,5) are in the body -> inside
    assert list(a) == [False, True, True, False]


def test_shared_edge_exactly_one_winner():
    """Half-open rule: a point on a shared edge is in exactly one polygon."""
    left = np.array([[0.0, 0.0], [0.0, 5.0], [10.0, 5.0], [10.0, 0.0]])
    right = np.array([[0.0, 5.0], [0.0, 10.0], [10.0, 10.0], [10.0, 5.0]])
    lat = np.array([3.0, 7.2, 5.0])
    lon = np.array([5.0, 5.0, 5.0])  # exactly on the shared lon=5 edge
    in_l = geo.points_in_polygon(lat, lon, left)
    in_r = geo.points_in_polygon(lat, lon, right)
    assert ((in_l.astype(int) + in_r.astype(int)) == 1).all()


def test_pip_chunked_equals_unchunked():
    lat = RNG.uniform(-5, 15, 3000)
    lon = RNG.uniform(-5, 15, 3000)
    a = geo.points_in_polygon(lat, lon, CONCAVE)
    b = geo.points_in_polygon_chunked(lat, lon, CONCAVE, chunk=257)
    assert (a == b).all()


def test_haversine_known_values():
    # one degree of latitude ~ 111.19 km
    d = geo.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111_195) < 100
    assert geo.haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0


def test_cell_cover_correct_and_classified():
    res = 10
    cover, full = geo.polygon_cell_cover(CONCAVE, res)
    assert len(cover) > 0
    # every point inside the polygon falls in a covered cell
    lat = RNG.uniform(0, 10, 3000)
    lon = RNG.uniform(0, 10, 3000)
    inside = geo.points_in_polygon(lat, lon, CONCAVE)
    pc = cells.cell_encode(lat[inside], lon[inside], res)
    assert np.isin(pc, cover).all()
    # cells marked full_inside contain only inside points
    full_cells = set(cover[full].tolist())
    if full_cells:
        mask = np.isin(cells.cell_encode(lat, lon, res), list(full_cells))
        assert inside[mask].all()
    # classification saves refinement work on a blobby polygon
    assert full.sum() > 0

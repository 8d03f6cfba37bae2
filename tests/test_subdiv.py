"""Subdiv2D Delaunay/Voronoi vs cv2 (triangle sets are unique for
points in general position)."""

import numpy as np
import pytest

from rustcv_tpu.ops.subdiv import Subdiv2D

cv2 = pytest.importorskip("cv2")


def _tri_set(tris, decimals=3):
    out = set()
    for t in np.asarray(tris).reshape(-1, 6):
        pts = sorted((round(float(t[i]), decimals),
                      round(float(t[i + 1]), decimals))
                     for i in (0, 2, 4))
        out.add(tuple(pts))
    return out


def test_delaunay_matches_cv2(rng):
    pts = np.random.default_rng(5).uniform(10, 190, (25, 2)).astype(
        np.float32)
    ours = Subdiv2D((0, 0, 200, 200))
    ours.insert_multiple(pts)
    ref = cv2.Subdiv2D((0, 0, 200, 200))
    for p in pts:
        ref.insert(tuple(float(v) for v in p))
    ref_tris = [t for t in ref.getTriangleList()
                if all(0 <= t[i] <= 200 for i in range(6))]
    assert _tri_set(ours.get_triangle_list()) == _tri_set(ref_tris)


def test_find_nearest_and_voronoi():
    pts = np.array([[50.0, 50.0], [150.0, 50.0], [100.0, 150.0],
                    [100.0, 80.0]])
    sd = Subdiv2D((0, 0, 200, 200))
    sd.insert_multiple(pts)
    i, q = sd.find_nearest((95.0, 78.0))
    assert i == 3 and np.allclose(q, [100, 80])
    facets, centers = sd.get_voronoi_facet_list()
    assert len(facets) == 4
    np.testing.assert_allclose(centers, pts)
    # the interior site's facet contains it
    import matplotlib.path as mpath

    poly = mpath.Path(facets[3])
    assert poly.contains_point((100, 80))


def test_insert_outside_raises():
    sd = Subdiv2D((0, 0, 100, 100))
    with pytest.raises(ValueError):
        sd.insert((200.0, 50.0))

"""find_contours_tree + cv2-facade findContours modes vs real cv2.

The frozen spec (ops/ccl.py) promises cv2-matching point order for outer
and hole boundaries and a structurally identical hierarchy; ordering of
the contour list matches cv2's TREE order on nested-rectangle scenes and
is compared structurally (set + parent relations) on random masks where
cv2's enumeration order differs.
"""
from __future__ import annotations

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from rustcv_tpu.ops import ccl  # noqa: E402
import rustcv_tpu.cv2 as rcv  # noqa: E402


def _nested_scene():
    m = np.zeros((12, 14), np.uint8)
    m[2:10, 2:12] = 255
    m[4:8, 4:8] = 0
    m[5:7, 5:7] = 255
    return m


def _rel(cts, parents):
    """Order-insensitive (contour, parent-contour) relation set."""
    sets = [frozenset(map(tuple, np.asarray(c).reshape(-1, 2).tolist()))
            for c in cts]
    return sorted(
        (min(sets[i]), min(sets[int(p)]) if int(p) >= 0 else None)
        for i, p in enumerate(parents)
    )


def _sets(cts):
    # canonical total order (sorting raw frozensets would use the subset
    # PARTIAL order and give garbage)
    return sorted(tuple(sorted(map(tuple,
                                   np.asarray(c).reshape(-1, 2).tolist())))
                  for c in cts)


def test_tree_exact_nested():
    m = _nested_scene()
    cts, hier, kinds = ccl.find_contours_tree(m)
    ref_cts, ref_hier = cv.findContours(m, cv.RETR_TREE, cv.CHAIN_APPROX_NONE)
    assert len(cts) == len(ref_cts) == 3
    for c, rc in zip(cts, ref_cts):
        np.testing.assert_array_equal(c, rc.reshape(-1, 2))
    np.testing.assert_array_equal(hier, ref_hier[0])
    assert kinds == ["outer", "hole", "outer"]


def test_connectivity8_diagonal_blob():
    m = np.zeros((10, 10), np.uint8)
    for i in range(6):
        m[i + 2, i + 1] = 255  # pure diagonal chain = ONE 8-conn component
    cts, hier, kinds = ccl.find_contours_tree(m)
    assert len(cts) == 1
    n8, _ = ccl.connected_components(m, connectivity=8)
    n4, _ = ccl.connected_components(m, connectivity=4)
    assert n8 == 1 and n4 == 6


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_tree_random_masks_structural(seed):
    rng = np.random.RandomState(seed)
    m = (rng.rand(48, 64) > 0.55).astype(np.uint8) * 255
    # close tiny specks so boundaries are non-degenerate but keep topology rich
    cts, hier, kinds = ccl.find_contours_tree(m)
    ref_cts, ref_hier = cv.findContours(m, cv.RETR_TREE, cv.CHAIN_APPROX_NONE)
    assert len(cts) == len(ref_cts)
    assert _sets(cts) == _sets([c.reshape(-1, 2) for c in ref_cts])
    assert _rel(cts, hier[:, 3]) == _rel(
        [c.reshape(-1, 2) for c in ref_cts], ref_hier[0][:, 3])


def test_facade_modes_match_cv2():
    m = np.zeros((40, 50), np.uint8)
    m[1:30, 1:40] = 255
    m[5:25, 5:35] = 0
    m[8:20, 8:30] = 255
    m[10:15, 10:25] = 0
    m[11:13, 12:20] = 255
    m[33:36, 3:8] = 255
    for mode in (rcv.RETR_EXTERNAL, rcv.RETR_LIST, rcv.RETR_CCOMP,
                 rcv.RETR_TREE):
        ours, oh = rcv.findContours(m, mode, rcv.CHAIN_APPROX_NONE)
        refs, rh = cv.findContours(m, mode, cv.CHAIN_APPROX_NONE)
        assert len(ours) == len(refs), mode
        assert _sets(ours) == _sets(refs), mode
        if mode in (rcv.RETR_CCOMP, rcv.RETR_TREE):
            assert _rel(ours, oh[0][:, 3]) == _rel(refs, rh[0][:, 3]), mode


def test_facade_simple_approx_and_offset():
    m = _nested_scene()
    ours, _ = rcv.findContours(m, rcv.RETR_TREE, rcv.CHAIN_APPROX_SIMPLE,
                               offset=(3, 5))
    refs, _ = cv.findContours(m, cv.RETR_TREE, cv.CHAIN_APPROX_SIMPLE,
                              offset=(3, 5))
    # SIMPLE keeps segment endpoints; compare as point sets per contour
    assert _sets(ours) == _sets(refs)


def test_empty_mask():
    m = np.zeros((8, 8), np.uint8)
    cts, hier = rcv.findContours(m, rcv.RETR_TREE, rcv.CHAIN_APPROX_NONE)
    assert cts == () and hier is None


def test_external_excludes_nested_islands():
    m = _nested_scene()
    cts, hier = rcv.findContours(m, rcv.RETR_EXTERNAL, rcv.CHAIN_APPROX_NONE)
    refs, _ = cv.findContours(m, cv.RETR_EXTERNAL, cv.CHAIN_APPROX_NONE)
    assert len(cts) == len(refs) == 1  # the island must NOT appear
    np.testing.assert_array_equal(np.asarray(cts[0]), refs[0])

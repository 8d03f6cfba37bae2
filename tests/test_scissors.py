"""Intelligent Scissors: the live-wire follows ridges, endpoints exact,
comparable to cv2's IntelligentScissorsMB."""

import numpy as np
import pytest

from rustcv_tpu.ops.scissors import IntelligentScissors

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ridge_scene():
    img = np.zeros((60, 80), np.uint8)
    ys, xs = np.mgrid[0:60, 0:80]
    curve_y = 20 + 10 * np.sin(xs[0] / 12.0)
    img[np.abs(ys - (20 + 10 * np.sin(xs / 12.0))) < 1.5] = 220
    return cv2.GaussianBlur(img, (3, 3), 0.8), curve_y


def test_follows_ridge(ridge_scene):
    img, curve_y = ridge_scene
    tool = IntelligentScissors().apply_image(img)
    tool.build_map((5, 20))
    path = tool.get_contour((75, 22))
    assert tuple(path[0]) == (5, 20) and tuple(path[-1]) == (75, 22)
    # mean deviation from the true curve stays small mid-path
    mid = path[5:-5]
    dev = np.abs(mid[:, 1] - curve_y[mid[:, 0]])
    assert dev.mean() < 2.5, dev.mean()
    # a straight line would deviate much more
    line_y = np.linspace(20, 22, len(mid))
    line_dev = np.abs(line_y - curve_y[mid[:, 0]])
    assert dev.mean() < 0.5 * line_dev.mean()


def test_close_to_cv2(ridge_scene):
    img, _ = ridge_scene
    tool = IntelligentScissors(30, 90).apply_image(img)
    tool.build_map((5, 20))
    ours = tool.get_contour((75, 22))

    ref_tool = cv2.segmentation_IntelligentScissorsMB()
    ref_tool.setEdgeFeatureCannyParameters(30, 90)
    ref_tool.applyImage(img)
    ref_tool.buildMap((5, 20))
    ref = ref_tool.getContour((75, 22)).reshape(-1, 2)

    # mean nearest-point distance between the two paths
    d = np.abs(ours[:, None, :] - ref[None, :, :]).sum(-1)
    assert d.min(axis=1).mean() < 2.0


def test_unreachable_without_map(ridge_scene):
    img, _ = ridge_scene
    tool = IntelligentScissors().apply_image(img)
    tool.build_map((5, 20))
    with pytest.raises(ValueError):
        tool.get_contour((1000, 20))

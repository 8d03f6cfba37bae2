"""GrabCut — min-cut correctness (native Dinic), segmentation quality on
synthetic scenes, OpenCV mask-code semantics, determinism."""

import ctypes

import numpy as np
import pytest

from rustcv_tpu.ops import grabcut

pytestmark = pytest.mark.skipif(
    not __import__("rustcv_tpu.native", fromlist=["available"]).available(),
    reason="native lib unavailable")


def _maxflow(h, w, src, snk, r, d, dr, dl):
    from rustcv_tpu import native

    lib = native.get_lib()
    i64p = ctypes.POINTER(ctypes.c_int64)
    lab = np.zeros(h * w, np.uint8)

    def q(a):
        return np.ascontiguousarray(a, np.int64).reshape(-1)

    flow = lib.rcv_maxflow_grid(
        h, w, q(src).ctypes.data_as(i64p), q(snk).ctypes.data_as(i64p),
        q(r).ctypes.data_as(i64p), q(d).ctypes.data_as(i64p),
        q(dr).ctypes.data_as(i64p), q(dl).ctypes.data_as(i64p),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return flow, lab.reshape(h, w)


class TestMaxflow:
    def test_seam_cut(self):
        h, w = 4, 5
        src = np.zeros((h, w), np.int64); src[:, :2] = 1000
        snk = np.zeros((h, w), np.int64); snk[:, 3:] = 1000
        r = np.full((h, w), 10, np.int64)
        z = np.zeros((h, w), np.int64)
        flow, lab = _maxflow(h, w, src, snk, r, np.full((h, w), 10, np.int64), z, z)
        assert flow == 40  # 4 rows x cap 10 across one column seam
        assert lab[:, :2].all() and not lab[:, 3:].any()

    def test_weak_link_cut_not_terminal(self):
        # a single chain s -> a(100) - b(1) - c(100) -> t: min cut = 1
        h, w = 1, 3
        src = np.array([[100, 0, 0]], np.int64)
        snk = np.array([[0, 0, 100]], np.int64)
        r = np.array([[100, 1, 0]], np.int64)
        z = np.zeros((h, w), np.int64)
        flow, lab = _maxflow(h, w, src, snk, r, z, z, z)
        assert flow == 1
        assert lab[0, 0] and lab[0, 1] and not lab[0, 2]

    def test_diagonal_edges_connect(self):
        h, w = 2, 2
        src = np.array([[50, 0], [0, 0]], np.int64)
        snk = np.array([[0, 0], [0, 50]], np.int64)
        z = np.zeros((h, w), np.int64)
        dr = np.array([[7, 0], [0, 0]], np.int64)
        flow, lab = _maxflow(h, w, src, snk, z, z, dr, z)
        assert flow == 7  # only the diagonal connects source to sink sides


class TestGrabCut:
    def _scene(self, seed=0):
        rng = np.random.default_rng(seed)
        h, w = 100, 130
        img = rng.normal(60, 12, (h, w, 3)).clip(0, 255)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = ((xx - 65) ** 2 / 1100 + (yy - 50) ** 2 / 600) < 1.0
        img[blob] = rng.normal(190, 12, (h, w, 3)).clip(0, 255)[blob]
        return img.astype(np.uint8), blob

    def test_rect_init_high_iou(self):
        img, blob = self._scene()
        mask = grabcut.grab_cut(img, rect=(20, 15, 95, 72), iter_count=5)
        fg = np.isin(mask, [grabcut.GC_FGD, grabcut.GC_PR_FGD])
        iou = (fg & blob).sum() / (fg | blob).sum()
        assert iou > 0.95
        # pixels outside the rect stay hard background
        assert (mask[:10, :] == grabcut.GC_BGD).all()

    def test_deterministic(self):
        img, _ = self._scene(1)
        m1 = grabcut.grab_cut(img, rect=(20, 15, 95, 72), seed=3)
        m2 = grabcut.grab_cut(img, rect=(20, 15, 95, 72), seed=3)
        assert np.array_equal(m1, m2)

    def test_user_constraints_respected(self):
        img, blob = self._scene(2)
        mask = np.full(img.shape[:2], grabcut.GC_PR_BGD, np.uint8)
        mask[blob] = grabcut.GC_PR_FGD
        # pin a background patch inside the blob as known BGD
        mask[48:52, 63:67] = grabcut.GC_BGD
        out = grabcut.grab_cut(img, mask=mask, iter_count=3)
        assert (out[48:52, 63:67] == grabcut.GC_BGD).all()
        fg = np.isin(out, [grabcut.GC_FGD, grabcut.GC_PR_FGD])
        assert fg.sum() > 0

    def test_mask_continue_refines(self):
        img, blob = self._scene(3)
        m0 = grabcut.grab_cut(img, rect=(20, 15, 95, 72), iter_count=1)
        m1 = grabcut.grab_cut(img, mask=m0, iter_count=3)
        fg = np.isin(m1, [1, 3])
        assert (fg & blob).sum() / max((fg | blob).sum(), 1) > 0.9

    def test_validation(self):
        img = np.zeros((10, 10, 3), np.uint8)
        with pytest.raises(ValueError, match="rect or mask"):
            grabcut.grab_cut(img)
        with pytest.raises(ValueError, match="GC_"):
            grabcut.grab_cut(img, mask=np.full((10, 10), 9, np.uint8))
        with pytest.raises(ValueError, match="BGR"):
            grabcut.grab_cut(np.zeros((10, 10), np.uint8), rect=(1, 1, 3, 3))

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img, blob = self._scene(4)
        mask = imgproc.grab_cut(Mat.from_array(img), rect=(20, 15, 95, 72))
        fg = np.isin(mask, [imgproc.GC_FGD, imgproc.GC_PR_FGD])
        assert (fg & blob).sum() / (fg | blob).sum() > 0.9

"""SimpleBlobDetector role — synthetic disc/shape scenes."""

import numpy as np
import pytest

from rustcv_tpu.ops import blob


def _scene(discs, h=120, w=160, bg=220, fg=40):
    img = np.full((h, w), bg, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for (cx, cy, r) in discs:
        img[(xx - cx) ** 2 + (yy - cy) ** 2 <= r * r] = fg
    return img


class TestBlobs:
    def test_finds_dark_discs(self, jax_cpu):
        discs = [(40, 40, 10), (110, 60, 14), (70, 95, 8)]
        img = _scene(discs)
        out = blob.detect_blobs(img)
        assert len(out) == 3
        for (cx, cy, r) in discs:
            d = np.hypot(out[:, 0] - cx, out[:, 1] - cy)
            k = int(np.argmin(d))
            assert d[k] < 1.5
            assert abs(out[k, 2] - 2 * r) < 2.5  # diameter

    def test_rejects_square_by_circularity(self, jax_cpu):
        img = np.full((80, 80), 220, np.uint8)
        img[20:50, 20:50] = 40  # square: circularity ~0.785
        out = blob.detect_blobs(img, blob.BlobParams(min_circularity=0.8))
        assert len(out) == 0
        out2 = blob.detect_blobs(
            img, blob.BlobParams(min_circularity=0.5))
        assert len(out2) == 1

    def test_rejects_elongated_by_inertia(self, jax_cpu):
        img = np.full((80, 120), 220, np.uint8)
        img[38:43, 20:100] = 40  # long thin bar
        out = blob.detect_blobs(
            img, blob.BlobParams(min_circularity=0.0, min_convexity=0.0))
        assert len(out) == 0

    def test_area_filter(self, jax_cpu):
        img = _scene([(40, 40, 3), (100, 60, 12)])  # tiny + normal
        out = blob.detect_blobs(img, blob.BlobParams(min_area=50))
        assert len(out) == 1
        assert abs(out[0, 0] - 100) < 1.5

    def test_bright_blobs(self, jax_cpu):
        img = _scene([(60, 50, 11)], bg=30, fg=200)
        out = blob.detect_blobs(img, blob.BlobParams(blob_color=255))
        assert len(out) == 1 and abs(out[0, 0] - 60) < 1.5

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _scene([(50, 40, 9)])
        out = imgproc.detect_blobs(Mat.from_array(img))
        assert len(out) == 1

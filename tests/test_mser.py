"""MSER: native ↔ frozen-spec bit-exactness, detection semantics on
synthetic scenes, parameter contracts, and the facade."""

import numpy as np
import pytest

from rustcv_tpu import native
from rustcv_tpu.ops.mser import (_mser_triples_spec, mser_regions,
                                 mser_triples)


def _blob_image(seed=0, h=120, w=160, blobs=((40, 50, 18, 30),
                                             (80, 110, 14, 60))):
    """Dark soft-edged blobs on a bright background + mild noise."""
    img = np.full((h, w), 220, np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx, r, v in blobs:
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        ramp = (v + (d - r) / 6 * (220 - v)).astype(np.int32)
        img = np.where(d < r, v, np.where(d < r + 6, ramp, img))
    rng = np.random.default_rng(seed)
    img = img + rng.normal(0, 2, img.shape).astype(np.int32)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestNativeMatchesSpec:
    @pytest.mark.skipif(not native.available(), reason="no native lib")
    @pytest.mark.parametrize("kind", ["noise", "blobs", "gradient"])
    def test_bit_exact_triples(self, kind):
        rng = np.random.default_rng(hash(kind) % 2**31)
        for _ in range(3):
            h, w = int(rng.integers(24, 80)), int(rng.integers(24, 80))
            if kind == "noise":
                img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            elif kind == "blobs":
                img = _blob_image(seed=int(rng.integers(99)), h=h, w=w,
                                  blobs=((h // 3, w // 3, min(h, w) // 5,
                                          40),))
            else:
                img = (np.linspace(0, 255, w)[None, :]
                       + rng.normal(0, 8, (h, w))).clip(0, 255).astype(
                           np.uint8)
            spec = _mser_triples_spec(img, 5, 20, h * w // 2, 0.25, 0.2)
            nat = native.mser_triples(img, 5, 20, h * w // 2, 0.25, 0.2)
            assert spec == [tuple(int(v) for v in r) for r in nat]


class TestDetection:
    def test_dark_blobs_found(self):
        img = _blob_image()
        regions, bboxes = mser_regions(img, polarity="dark")
        assert len(regions) >= 2
        # every blob center is inside at least one region bbox
        for cy, cx in ((40, 50), (80, 110)):
            hit = any(x <= cx < x + w_ and y <= cy < y + h_
                      for x, y, w_, h_ in bboxes)
            assert hit, (cy, cx, bboxes)

    def test_bright_blob_needs_bright_polarity(self):
        img = 255 - _blob_image()  # bright blobs on dark
        r_dark, _ = mser_regions(img, polarity="dark")
        r_bright, _ = mser_regions(img, polarity="bright")
        assert len(r_bright) >= 2
        assert len(r_dark) == 0

    def test_region_pixels_are_level_component(self):
        img = _blob_image()
        triples = mser_triples(img, use_native=False)
        regions, _ = mser_regions(img, polarity="dark")
        assert len(regions) == len(triples)
        for (seed, lv, area), pts in zip(triples, regions):
            assert len(pts) == area
            vals = img[pts[:, 1], pts[:, 0]]
            assert vals.max() <= lv

    def test_min_area_filters(self):
        img = _blob_image()
        regions, _ = mser_regions(img, polarity="dark", min_area=5000)
        assert all(len(r) >= 5000 for r in regions)

    def test_deterministic(self):
        img = _blob_image(seed=3)
        a = mser_regions(img)
        b = mser_regions(img)
        assert len(a[0]) == len(b[0])
        np.testing.assert_array_equal(a[1], b[1])
        for ra, rb in zip(a[0], b[0]):
            np.testing.assert_array_equal(ra, rb)

    def test_flat_image_no_regions(self):
        regions, bboxes = mser_regions(
            np.full((60, 60), 128, np.uint8), max_area=1800)
        assert len(regions) == 0 and bboxes.shape == (0, 4)

    def test_bad_args(self):
        with pytest.raises(ValueError):
            mser_regions(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(ValueError):
            mser_regions(np.zeros((4, 4), np.uint8), polarity="up")


class TestFacade:
    def test_mat_input(self):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        img = _blob_image()
        bgr = np.repeat(img[:, :, None], 3, axis=2)
        regions, bboxes = ip.detect_mser_regions(Mat.from_array(bgr),
                                                 polarity="dark")
        assert len(regions) >= 2
        assert bboxes.shape[1] == 4

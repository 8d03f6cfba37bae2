"""SLIC superpixels: device twin vs frozen oracle + structural
invariants (no cv2.ximgproc in this build to compare against)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import slic


@pytest.fixture(scope="module")
def img():
    # smooth color field + blocky structure → meaningful superpixels
    # (LOCAL rng: the boundary-band assertion is seed-sensitive and the
    # session rng's state depends on test order)
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:80, 0:100]
    base = np.stack([
        128 + 80 * np.sin(x / 17.0),
        128 + 80 * np.cos(y / 23.0),
        64 + (x // 25 + y // 20) * 25,
    ], -1)
    return np.clip(base + rng.normal(0, 3, base.shape), 0,
                   255).astype(np.uint8)


def test_device_matches_oracle(img, jax_cpu):
    raw_np = slic.slic_numpy(img, region_size=16, num_iterations=4)
    raw_dev = np.asarray(slic.slic_device(jnp.asarray(img),
                                          region_size=16,
                                          num_iterations=4))
    agree = (raw_np == raw_dev).mean()
    assert agree > 0.97, f"device/oracle agreement {agree}"
    # f32/f64 divergence only flips near-tie pixels — every
    # disagreement must sit within 3 px of an oracle label boundary
    dis = raw_np != raw_dev
    bnd = np.zeros_like(dis)
    bnd[1:, :] |= raw_np[1:, :] != raw_np[:-1, :]
    bnd[:-1, :] |= raw_np[1:, :] != raw_np[:-1, :]
    bnd[:, 1:] |= raw_np[:, 1:] != raw_np[:, :-1]
    bnd[:, :-1] |= raw_np[:, 1:] != raw_np[:, :-1]
    for _ in range(3):  # dilate the band by 3
        grown = bnd.copy()
        grown[1:, :] |= bnd[:-1, :]
        grown[:-1, :] |= bnd[1:, :]
        grown[:, 1:] |= bnd[:, :-1]
        grown[:, :-1] |= bnd[:, 1:]
        bnd = grown
    assert not (dis & ~bnd).any()


def test_labels_structure(img):
    labels, n = slic.slic_superpixels(img, region_size=16,
                                      num_iterations=4)
    assert labels.shape == img.shape[:2]
    assert labels.min() == 0 and labels.max() == n - 1
    # count close to the grid size (80/16)*(100/16→7) = 5*7
    assert 20 <= n <= 50
    # connectivity: every label is one 4-connected component
    from rustcv_tpu.ops.ccl import connected_components_numpy
    for lv in range(min(n, 8)):
        mask = (labels == lv).astype(np.uint8)
        n_comp = int(connected_components_numpy(mask)[0])
        assert n_comp == 1, f"label {lv} split into {n_comp}"
    # no tiny fragments
    counts = np.bincount(labels.ravel())
    assert counts.min() >= (16 * 16) // 4


def test_compactness_effect(img):
    loose, _ = slic.slic_superpixels(img, 16, ruler=1.0,
                                     num_iterations=4)
    tight, _ = slic.slic_superpixels(img, 16, ruler=40.0,
                                     num_iterations=4)

    def boundary_len(lab):
        return ((lab[1:, :] != lab[:-1, :]).sum()
                + (lab[:, 1:] != lab[:, :-1]).sum())

    # higher ruler (spatial weight) → more compact → shorter boundaries
    assert boundary_len(tight) < boundary_len(loose)


def test_gray_input(img):
    gray = img.mean(-1).astype(np.uint8)
    labels, n = slic.slic_superpixels(gray, region_size=20,
                                      num_iterations=3)
    assert labels.shape == gray.shape and n > 10

"""k-means (matmul Lloyd iterations): cluster recovery, oracle agreement,
determinism, and color quantization."""

import numpy as np
import pytest

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import kmeans as km


@pytest.fixture()
def clusters(rng):
    pts = np.concatenate([
        rng.normal((0, 0), 0.5, (200, 2)),
        rng.normal((10, 0), 0.5, (200, 2)),
        rng.normal((5, 8), 0.5, (200, 2)),
    ]).astype(np.float32)
    rng.shuffle(pts)
    return pts


class TestKMeans:
    def test_recovers_separated_clusters(self, jax_cpu, clusters):
        c, lab, inertia = km.kmeans(clusters, 3, iters=15)
        found = sorted(
            tuple(np.round(np.asarray(cc)).astype(int)) for cc in np.asarray(c)
        )
        assert found == [(0, 0), (5, 8), (10, 0)]
        assert float(inertia) < 400  # ≈ N·2σ² for σ=0.5

    def test_matches_oracle_from_same_init(self, jax_cpu, clusters):
        init = km.kmeans_pp_init(clusters, 3)
        c, lab, _ = km.kmeans(clusters, 3, iters=15, init_centers=init)
        oc, ol, _ = km.kmeans_numpy(clusters, 3, iters=15, init_centers=init)
        assert np.abs(np.asarray(c) - oc).max() < 1e-3
        assert (np.asarray(lab) == ol).mean() > 0.999

    def test_deterministic(self, jax_cpu, clusters):
        c1, l1, _ = km.kmeans(clusters, 3)
        c2, l2, _ = km.kmeans(clusters, 3)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_quantize(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = sim.synth_bgr(64, 48, 3)
        qmat, pal = imgproc.kmeans_quantize(Mat.from_array(img), k=8)
        q = qmat.to_numpy()
        uniq = np.unique(q.reshape(-1, 3), axis=0)
        assert len(uniq) <= 8 and pal.shape == (8, 3)
        # quantization error bounded and better than a 2-color palette
        e8 = np.abs(q.astype(int) - img.astype(int)).mean()
        q2, _ = imgproc.kmeans_quantize(Mat.from_array(img), k=2)
        e2 = np.abs(q2.to_numpy().astype(int) - img.astype(int)).mean()
        assert e8 < e2

"""cv2.dnn array utilities + utils/samples/typing/parallel shims."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def test_blob_from_image_exact():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 40, 3), np.uint8)
    g = R.dnn.blobFromImage(img, 1 / 255.0, (20, 16), (104, 117, 123),
                            swapRB=True, crop=False)
    w = cv2.dnn.blobFromImage(img, 1 / 255.0, (20, 16), (104, 117, 123),
                              swapRB=True, crop=False)
    assert g.shape == w.shape == (1, 3, 16, 20)
    np.testing.assert_allclose(g, w, atol=2 / 255.0)  # resize ±1 LSB
    g2 = R.dnn.blobFromImage(img, 1.0, (20, 16), (0, 0, 0), crop=True)
    w2 = cv2.dnn.blobFromImage(img, 1.0, (20, 16), (0, 0, 0), crop=True)
    assert g2.shape == w2.shape
    np.testing.assert_allclose(g2, w2, atol=2.0)
    # no-resize path is exact
    g3 = R.dnn.blobFromImage(img, 0.5, None, (1, 2, 3), swapRB=True)
    w3 = cv2.dnn.blobFromImage(img, 0.5, (0, 0), (1, 2, 3), swapRB=True)
    np.testing.assert_allclose(g3, w3, atol=1e-5)


def test_blob_images_roundtrip():
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (8, 10, 3), np.uint8) for _ in range(3)]
    g = R.dnn.blobFromImages(imgs, 1.0, None, (0, 0, 0))
    w = cv2.dnn.blobFromImages(imgs, 1.0, (0, 0), (0, 0, 0))
    np.testing.assert_allclose(g, w, atol=1e-5)
    back = R.dnn.imagesFromBlob(g)
    wback = cv2.dnn.imagesFromBlob(w)
    for a, b in zip(back, wback):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_nms_boxes_exact():
    rng = np.random.RandomState(2)
    boxes = [[float(x), float(y), float(w), float(h)]
             for x, y, w, h in rng.randint(0, 40, (30, 4)) + [0, 0, 5, 5]]
    scores = rng.rand(30).astype(np.float32).tolist()
    g = R.dnn.NMSBoxes(boxes, scores, 0.3, 0.4)
    w = cv2.dnn.NMSBoxes(boxes, scores, 0.3, 0.4)
    np.testing.assert_array_equal(np.asarray(g).ravel(),
                                  np.asarray(w).ravel())
    cls = rng.randint(0, 3, 30).tolist()
    g = R.dnn.NMSBoxesBatched(boxes, scores, cls, 0.3, 0.4)
    w = cv2.dnn.NMSBoxesBatched(boxes, scores, cls, 0.3, 0.4)
    np.testing.assert_array_equal(np.asarray(g).ravel(),
                                  np.asarray(w).ravel())


def test_soft_nms():
    boxes = [[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 5, 5]]
    scores = [0.9, 0.8, 0.7]
    gs, gi = R.dnn.softNMSBoxes(boxes, scores, 0.5, 0.4)
    ws, wi = cv2.dnn.softNMSBoxes(boxes, scores, 0.5, 0.4)
    np.testing.assert_array_equal(gi, np.asarray(wi).ravel())
    np.testing.assert_allclose(gs, np.asarray(ws).ravel(), atol=1e-6)


def test_net_guards():
    with pytest.raises(NotImplementedError):
        R.dnn.readNetFromONNX("x.onnx")
    with pytest.raises(NotImplementedError):
        R.dnn.Net()


def test_utils_and_samples(tmp_path):
    assert "Int: 3" == R.utils.dumpInt(3)
    assert R.utils.dumpBool(True) == cv2.utils.dumpBool(True)
    assert R.utils.dumpInt(7) == cv2.utils.dumpInt(7)
    prev = R.utils.logging.setLogLevel(R.utils.logging.LOG_LEVEL_ERROR)
    assert R.utils.logging.getLogLevel() == \
        R.utils.logging.LOG_LEVEL_ERROR
    R.utils.logging.setLogLevel(prev)
    p = tmp_path / "x.txt"
    p.write_text("hi")
    R.samples.addSamplesDataSearchPath(str(tmp_path))
    assert R.samples.findFile("x.txt") == str(p)
    assert R.samples.findFileOrKeep("nope.txt") == "nope.txt"
    with pytest.raises(FileNotFoundError):
        R.samples.findFile("nope.txt")
    assert R.parallel.setParallelForBackend("tbb")
    assert R.typing.MatLike is np.ndarray

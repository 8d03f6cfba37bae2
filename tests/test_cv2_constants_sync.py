"""Every integer enum constant OpenCV 5.0 exposes (outside cuda/ocl/
dnn/gapi/detail scopes, N/A on this stack) must exist in our facade
with the identical value."""
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")

_SKIP = ("cuda_", "ocl_", "dnn_", "gapi", "detail_", "utils_", "ipp",
         "Error_")


def test_every_cv2_int_constant_matches():
    missing, wrong = [], []
    checked = 0
    for n in dir(cv2):
        if n.startswith("_") or any(n.startswith(p) for p in _SKIP):
            continue
        v = getattr(cv2, n)
        if isinstance(v, bool) or not isinstance(v, int):
            continue
        if not hasattr(R, n):
            if n[0].isupper():
                missing.append(n)
            continue
        checked += 1
        if getattr(R, n) != v:
            wrong.append((n, getattr(R, n), v))
    assert checked > 1500
    assert not wrong, wrong[:20]
    assert not missing, missing[:20]

"""FileStorage round-trips: ours <-> OpenCV 5.0, all three formats."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")

MATS = {
    "m_f32": np.arange(6, dtype=np.float32).reshape(2, 3),
    "m_f64": np.array([[1.5, -2.25], [0.0, 1e-3]]),
    "m_u8": np.arange(4, dtype=np.uint8).reshape(2, 2),
    "m_i16": np.array([[1, -2]], np.int16),
    "m_3u": np.arange(12, dtype=np.uint8).reshape(2, 2, 3),
}


def _write_all(fs, FS_SEQ, FS_MAP):
    fs.write("an_int", 42)
    fs.write("a_real", 3.25)
    fs.write("a_string", "hello world")
    for k, v in MATS.items():
        fs.write(k, v)
    fs.startWriteStruct("a_seq", FS_SEQ)
    for v in (1, 2.5, "x"):
        fs.write("", v)
    fs.endWriteStruct()
    fs.startWriteStruct("a_map", FS_MAP)
    fs.write("k1", 7)
    fs.write("k2", "v")
    fs.endWriteStruct()


def _check_all(fs):
    n = fs.getNode("an_int")
    assert n.isInt() and n.real() == 42 and not n.empty()
    assert fs.getNode("a_real").isReal()
    assert fs.getNode("a_real").real() == 3.25
    assert fs.getNode("a_string").string() == "hello world"
    for k, v in MATS.items():
        got = fs.getNode(k).mat()
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got.reshape(v.shape), v, err_msg=k)
    seq = fs.getNode("a_seq")
    assert seq.isSeq() and seq.size() == 3
    assert seq.at(0).real() == 1
    assert seq.at(1).real() == 2.5
    assert seq.at(2).string() == "x"
    m = fs.getNode("a_map")
    assert m.isMap()
    assert tuple(m.keys()) == ("k1", "k2")
    assert m.getNode("k1").real() == 7
    assert m.getNode("k2").string() == "v"
    assert fs.getNode("nonexistent").empty()


@pytest.mark.parametrize("ext", ["yml", "json", "xml"])
def test_ours_write_cv2_read(tmp_path, ext):
    p = str(tmp_path / f"ours.{ext}")
    fs = R.FileStorage(p, R.FILE_STORAGE_WRITE)
    assert fs.isOpened()
    _write_all(fs, R.FileNode_SEQ, R.FileNode_MAP)
    fs.release()
    w = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
    assert w.isOpened(), open(p).read()
    _check_all(w)
    w.release()


@pytest.mark.parametrize("ext", ["yml", "json", "xml"])
def test_cv2_write_ours_read(tmp_path, ext):
    p = str(tmp_path / f"cv.{ext}")
    fs = cv2.FileStorage(p, cv2.FILE_STORAGE_WRITE)
    _write_all(fs, cv2.FileNode_SEQ, cv2.FileNode_MAP)
    fs.release()
    g = R.FileStorage(p, R.FILE_STORAGE_READ)
    assert g.isOpened()
    _check_all(g)
    assert tuple(g.root().keys())[:3] == ("an_int", "a_real", "a_string")
    g.release()


def test_ours_roundtrip_self(tmp_path):
    for ext in ("yml", "json", "xml"):
        p = str(tmp_path / f"self.{ext}")
        fs = R.FileStorage(p, R.FILE_STORAGE_WRITE)
        _write_all(fs, R.FileNode_SEQ, R.FileNode_MAP)
        fs.release()
        g = R.FileStorage(p, R.FILE_STORAGE_READ)
        _check_all(g)
        g.release()


def test_memory_mode_both_ways():
    fs = R.FileStorage(".yml", R.FILE_STORAGE_WRITE | R.FILE_STORAGE_MEMORY)
    fs.write("x", 1)
    fs.write("m", np.eye(2, dtype=np.float32))
    s = fs.releaseAndGetString()
    # cv2 parses our in-memory string
    w = cv2.FileStorage(s, cv2.FILE_STORAGE_READ | cv2.FILE_STORAGE_MEMORY)
    assert w.getNode("x").real() == 1
    np.testing.assert_array_equal(w.getNode("m").mat(), np.eye(2))
    # and we parse cv2's
    w2 = cv2.FileStorage(".yml",
                         cv2.FILE_STORAGE_WRITE | cv2.FILE_STORAGE_MEMORY)
    w2.write("y", 2.5)
    s2 = w2.releaseAndGetString()
    g = R.FileStorage(s2, R.FILE_STORAGE_READ | R.FILE_STORAGE_MEMORY)
    assert g.getNode("y").real() == 2.5


def test_legacy_yaml_10_header():
    legacy = "%YAML:1.0\n---\nv: 3\nm: !!opencv-matrix\n   rows: 1\n" \
             "   cols: 2\n   dt: f\n   data: [ 1., 2. ]\n"
    g = R.FileStorage(legacy, R.FILE_STORAGE_READ | R.FILE_STORAGE_MEMORY)
    assert g.getNode("v").real() == 3
    np.testing.assert_array_equal(g.getNode("m").mat(),
                                  np.array([[1.0, 2.0]], np.float32))


def test_append_mode(tmp_path):
    p = str(tmp_path / "a.yml")
    fs = R.FileStorage(p, R.FILE_STORAGE_WRITE)
    fs.write("first", 1)
    fs.release()
    fs = R.FileStorage(p, R.FILE_STORAGE_APPEND)
    fs.write("second", 2)
    fs.release()
    w = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
    assert w.getNode("first").real() == 1
    assert w.getNode("second").real() == 2


def test_nested_structs_and_getitem(tmp_path):
    p = str(tmp_path / "n.json")
    fs = R.FileStorage(p, R.FILE_STORAGE_WRITE)
    fs.startWriteStruct("outer", R.FileNode_MAP)
    fs.startWriteStruct("inner_seq", R.FileNode_SEQ)
    fs.write("", 1)
    fs.write("", 2)
    fs.endWriteStruct()
    fs.write("leaf", "deep")
    fs.endWriteStruct()
    fs.release()
    w = cv2.FileStorage(p, cv2.FILE_STORAGE_READ)
    outer = w.getNode("outer")
    assert outer.getNode("inner_seq").size() == 2
    assert outer.getNode("leaf").string() == "deep"
    g = R.FileStorage(p, R.FILE_STORAGE_READ)
    assert g["outer"]["leaf"].string() == "deep"
    assert g["outer"]["inner_seq"][1].real() == 2

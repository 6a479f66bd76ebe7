"""Native (C/ctypes) RLE library parity vs the numpy reference."""
import numpy as np
import pytest

from devis_tpu.evaluation import _native
from devis_tpu.evaluation import rle as rle_lib


@pytest.fixture(autouse=True)
def reset_native():
    """Each test decides whether native is enabled; restore state after."""
    lib, tried = _native._lib, _native._tried
    yield
    _native._lib, _native._tried = lib, tried


def _force_numpy():
    _native._lib, _native._tried = None, True


def test_lib_builds_and_loads():
    assert _native.lib() is not None, "native librle.so failed to build/load"


def test_encode_decode_roundtrip(rng):
    L = _native.lib()
    if L is None:
        pytest.skip("no compiler")
    for _ in range(10):
        mask = (rng.rand(23, 31) > 0.5)
        flat = mask.flatten(order="F").astype(np.uint8)
        counts = _native.encode_counts(flat)
        ref = rle_lib._ensure_counts(rle_lib.encode(mask))
        assert counts.tolist() == ref
        back = _native.decode_counts(counts, flat.size)
        np.testing.assert_array_equal(back, flat)


def test_intersection_matches_numpy(rng):
    if _native.lib() is None:
        pytest.skip("no compiler")
    for _ in range(10):
        a = rng.rand(40, 50) > rng.uniform(0.3, 0.8)
        b = rng.rand(40, 50) > rng.uniform(0.3, 0.8)
        ra, rb = rle_lib.encode(a), rle_lib.encode(b)
        assert rle_lib.intersection(ra, rb) == int((a & b).sum())


def test_iou_matrix_native_vs_numpy(rng):
    if _native.lib() is None:
        pytest.skip("no compiler")
    dts = [rle_lib.encode(rng.rand(30, 40) > 0.5) for _ in range(4)]
    gts = [rle_lib.encode(rng.rand(30, 40) > 0.5) for _ in range(3)]
    crowd = [False, True, False]
    got = rle_lib.iou(dts, gts, iscrowd=crowd)
    _force_numpy()
    ref = rle_lib.iou(dts, gts, iscrowd=crowd)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_empty_and_full_masks():
    if _native.lib() is None:
        pytest.skip("no compiler")
    empty = rle_lib.encode(np.zeros((8, 9), bool))
    full = rle_lib.encode(np.ones((8, 9), bool))
    assert rle_lib.intersection(empty, full) == 0
    assert rle_lib.intersection(full, full) == 72
    m = rle_lib.iou([full], [empty, full])
    np.testing.assert_allclose(m, [[0.0, 1.0]])

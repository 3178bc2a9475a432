"""C++ RLE mask ops (pycocotools.mask-compatible API)."""

import numpy as np
import pytest

from s2vt_tpu.data.native_loader import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")

from s2vt_tpu.utils import mask as m  # noqa: E402


def _rand_mask(h, w, seed):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) > 0.6).astype(np.uint8)


def test_encode_decode_roundtrip():
    for seed in range(5):
        x = _rand_mask(13, 7, seed)
        assert np.array_equal(m.decode(m.encode(x)), x)


def test_area():
    x = _rand_mask(20, 20, 1)
    assert m.area(m.encode(x)) == int(x.sum())


def test_merge_union_and_intersect():
    a = _rand_mask(16, 9, 2)
    b = _rand_mask(16, 9, 3)
    ra, rb = m.encode(a), m.encode(b)
    assert np.array_equal(m.decode(m.merge([ra, rb])), (a | b))
    assert np.array_equal(m.decode(m.merge([ra, rb], intersect=True)), (a & b))


def test_iou_matches_numpy():
    a = _rand_mask(16, 9, 4)
    b = _rand_mask(16, 9, 5)
    got = m.iou([m.encode(a)], [m.encode(b)], [0])[0, 0]
    inter = (a & b).sum()
    union = (a | b).sum()
    assert got == pytest.approx(inter / union, abs=1e-9)
    # crowd semantics: denominator = dt area
    got_c = m.iou([m.encode(a)], [m.encode(b)], [1])[0, 0]
    assert got_c == pytest.approx(inter / a.sum(), abs=1e-9)


def test_to_bbox():
    x = np.zeros((10, 12), np.uint8)
    x[3:7, 2:9] = 1
    bbox = m.toBbox(m.encode(x))
    np.testing.assert_allclose(bbox, [2, 3, 7, 4])


def test_fr_bbox_roundtrip():
    rle = m.frBbox([2, 3, 7, 4], 10, 12)
    np.testing.assert_allclose(m.toBbox(rle), [2, 3, 7, 4])
    assert m.area(rle) == 28


def test_bbox_iou():
    dt = np.array([[0.0, 0.0, 4.0, 4.0]])
    gt = np.array([[2.0, 2.0, 4.0, 4.0]])
    got = m.bbox_iou(dt, gt, [0])[0, 0]
    assert got == pytest.approx(4.0 / 28.0)


def test_empty_and_full_masks():
    empty = np.zeros((5, 5), np.uint8)
    full = np.ones((5, 5), np.uint8)
    assert m.area(m.encode(empty)) == 0
    assert m.area(m.encode(full)) == 25
    assert np.array_equal(m.decode(m.encode(empty)), empty)
    assert np.array_equal(m.decode(m.encode(full)), full)
    np.testing.assert_allclose(m.toBbox(m.encode(empty)), [0, 0, 0, 0])


def test_string_roundtrip():
    for seed in range(4):
        x = _rand_mask(15, 11, seed)
        rle = m.encode(x)
        s = m.toString(rle)
        assert isinstance(s, bytes) and len(s) > 0
        back = m.frString(s, 15, 11)
        np.testing.assert_array_equal(back["counts"], rle["counts"])
        np.testing.assert_array_equal(m.decode(back), x)


def test_fr_poly_rectangle():
    # rectangle polygon == frBbox fill
    rle = m.frPoly([[2, 3, 9, 3, 9, 7, 2, 7]], 10, 12)
    want = np.zeros((10, 12), np.uint8)
    want[3:7, 2:9] = 1
    np.testing.assert_array_equal(m.decode(rle), want)


def test_fr_poly_triangle_area():
    rle = m.frPoly([[0, 0, 20, 0, 0, 20]], 20, 20)
    # half the 20x20 square, rasterized: ~200 +- boundary
    assert abs(m.area(rle) - 200) < 25


def test_fr_poly_union():
    rle = m.frPoly([[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 9, 6, 9, 9, 6, 9]],
                   12, 12)
    dec = m.decode(rle)
    assert dec[1, 1] == 1 and dec[7, 7] == 1 and dec[5, 5] == 0

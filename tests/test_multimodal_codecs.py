"""Pure-Python BMP/PPM codec round-trips (no Spark needed) — the real
decode path behind the multimodal suite (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from executor_u1mindexer_spark.operators import multimodal as MM


def _pixels(w: int, h: int, seed: int = 0) -> bytes:
    return bytes((seed * 7 + i) % 256 for i in range(w * h * 3))


def test_ppm_roundtrip():
    px = _pixels(4, 3, seed=5)
    w, h, out = MM.decode_ppm(MM.encode_ppm(4, 3, px))
    assert (w, h) == (4, 3)
    assert out == px


@pytest.mark.parametrize("w,h", [(4, 3), (3, 2), (5, 1), (2, 2)])
def test_bmp_roundtrip_with_row_padding(w, h):
    # widths not divisible by 4 exercise the row-padding logic
    px = _pixels(w, h, seed=9)
    ww, hh, out = MM.decode_bmp(MM.encode_bmp(w, h, px))
    assert (ww, hh) == (w, h)
    assert out == px


def test_decode_image_meta_dispatch_and_sum():
    px = _pixels(2, 2, seed=1)
    for payload, fmt in [
        (MM.encode_ppm(2, 2, px), "ppm"),
        (MM.encode_bmp(2, 2, px), "bmp"),
    ]:
        meta = MM.decode_image_meta(payload)
        assert meta == {
            "format": fmt,
            "width": 2,
            "height": 2,
            "pixel_sum": sum(px),
        }


def test_malformed_payloads_raise():
    with pytest.raises(ValueError):
        MM.decode_image_meta(b"\x89PNG....")
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n2 2\n127\n" + b"\x00" * 12)  # unsupported maxval
    with pytest.raises(ValueError):
        MM.decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 3)  # truncated


def test_compressed_decode_stub_is_loud():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG....")

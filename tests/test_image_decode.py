"""mm9 — the pure-numpy image decoder: netpbm and BMP round trips
(padding, orientation, color order), and the decoded-pixel-stats
operator against its closed-form oracle semantics."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from birli_spark.operators import multimodal as mm


def encode_bmp(img: np.ndarray, bottom_up: bool = True,
               bpp: int = 24) -> bytes:
    """Minimal uncompressed BITMAPINFOHEADER writer (test-side twin)."""
    h, w = img.shape[:2]
    rgb = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    px = np.zeros((h, w, nch), np.uint8)
    px[:, :, 0] = rgb[:, :, 2]          # B
    px[:, :, 1] = rgb[:, :, 1]          # G
    px[:, :, 2] = rgb[:, :, 0]          # R
    rows[:, :w * nch] = px.reshape(h, w * nch)
    if bottom_up:
        rows = rows[::-1]
    data = rows.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w,
                            h if bottom_up else -h,
                            1, bpp, 0, len(data), 2835, 2835, 0, 0))
    return header + data


def grad(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((y * 7 + x * 3) % 256).astype(np.uint8)


def test_pgm_roundtrip_with_comments():
    img = grad(11, 17)
    payload = (b"P5\n# a comment\n# another\n 17 11 \n255\n"
               + img.tobytes())
    got = mm.decode_image(payload)
    assert (got == img).all()


def test_ppm_color_roundtrip():
    h, w = 5, 7
    rgb = np.stack([grad(h, w), grad(h, w) * 2 % 256,
                    grad(h, w) * 3 % 256], axis=2).astype(np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    got = mm.decode_image(payload)
    assert got.shape == (h, w, 3)
    assert (got == rgb).all()


@pytest.mark.parametrize("bottom_up", [True, False])
@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("w", [5, 8])   # 5 forces row padding at 24bpp
def test_bmp_roundtrip(bottom_up, bpp, w):
    img = np.stack([grad(6, w), grad(6, w) * 5 % 256,
                    grad(6, w) * 9 % 256], axis=2).astype(np.uint8)
    got = mm.decode_image(encode_bmp(img, bottom_up, bpp))
    assert got.shape == (6, w, 3)
    assert (got == img).all()


def test_bmp_and_pgm_agree_on_same_image():
    img = grad(9, 13)
    via_pgm = mm.decode_image(b"P5\n13 9\n255\n" + img.tobytes())
    via_bmp = mm.decode_image(encode_bmp(img))[:, :, 0]
    assert (via_pgm == via_bmp).all()


def test_compressed_formats_raise_honestly():
    with pytest.raises((NotImplementedError, Exception)):
        mm.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_make_pgm_decodes_to_the_documented_bands():
    for doc_id in (0, 7, 123, 9999):
        img = mm.decode_image(mm.make_pgm(doc_id))
        w = 8 + doc_id % 16
        h = 6 + (doc_id * 3) % 12
        a = doc_id % 256
        b = (doc_id * 97) % 256
        assert img.shape == (h, w)
        assert (img[: h // 2] == a).all()
        assert (img[h // 2:] == b).all()


def test_pixel_stats_operator(spark, sf_dir):
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir).limit(20)
    got = mm.image_pixel_stats(mm.attach_pgm_media(docs)) \
            .orderBy("doc_id").toPandas()
    assert len(got) == 20
    for _, r in got.iterrows():
        d = int(r.doc_id)
        assert r.width == 8 + d % 16 and r.height == 6 + (d * 3) % 12
        a, b = d % 256, (d * 97) % 256
        assert r.top_left == a and r.bottom_right == b
        assert r.px_min == min(a, b) and r.px_max == max(a, b)

"""RICE_1 codec gates (functions/rice.py) and the legacy-gpubox scan's
Rice tile path (sources/legacy_gpubox.py): a Rice-coded fixture decodes
to the same cells as its gzip twin — the r2 verdict's last scan
NotImplementedError removed."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from birli_spark.functions.rice import rice_decode, rice_encode
from birli_spark.sources import fitscore as fc
from birli_spark.sources import legacy_gpubox as LG


def test_roundtrip_basic():
    rng = np.random.default_rng(7)
    a = rng.integers(-(2 ** 20), 2 ** 20, 513).astype(np.int32)
    assert (rice_decode(rice_encode(a), len(a)) == a).all()


def test_roundtrip_extremes():
    a = np.array([2**31 - 1, -(2**31), 0, -1, 1, 2**31 - 1, -(2**31)],
                 np.int32)
    assert (rice_decode(rice_encode(a), len(a)) == a).all()


def test_all_same_block_is_tiny():
    a = np.full(320, 12345, np.int32)
    enc = rice_encode(a)
    assert len(enc) < 16                     # fs=-1 blocks: 5 bits each
    assert (rice_decode(enc, len(a)) == a).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1,
                max_size=200))
def test_roundtrip_property(vals):
    a = np.array(vals, np.int32)
    assert (rice_decode(rice_encode(a), len(a)) == a).all()


def _scan_hdu(tiles: np.ndarray, rice: bool, unix_s: int = 1400000000,
              bscale: float = 0.5) -> bytes:
    """One legacy scan HDU (tile-compressed bintable): each fine-channel
    row either Rice-codes the scaled ints (col 1) or gzips the float64
    cells (col 2) — the two encodings cfitsio emits."""
    n_rows, n_vals = tiles.shape[0], tiles.shape[1] * 2
    payloads = []
    for r in range(n_rows):
        flat = tiles[r].reshape(-1)
        if rice:
            ints = np.round(flat / bscale).astype(np.int32)
            payloads.append(rice_encode(ints))
        else:
            payloads.append(zlib.compress(
                flat.astype(">f8").tobytes(), 6))
    heap = b"".join(payloads)
    offs = np.cumsum([0] + [len(p) for p in payloads[:-1]])
    rows = bytearray()
    for r in range(n_rows):
        d = np.zeros(4, dtype=">u4")
        if rice:
            d[0], d[1] = len(payloads[r]), offs[r]
        else:
            d[2], d[3] = len(payloads[r]), offs[r]
        rows += d.tobytes()
    table = bytes(rows)
    hdr = b"".join([
        fc.card("XTENSION", "BINTABLE"),
        fc.card("BITPIX", 8), fc.card("NAXIS", 2),
        fc.card("NAXIS1", 16), fc.card("NAXIS2", n_rows),
        fc.card("PCOUNT", len(heap)), fc.card("GCOUNT", 1),
        fc.card("TFIELDS", 2),
        fc.card("TFORM1", "1PB(0)"), fc.card("TTYPE1", "COMPRESSED_DATA"),
        fc.card("TFORM2", "1PB(0)"),
        fc.card("TTYPE2", "GZIP_COMPRESSED_DATA"),
        fc.card("ZIMAGE", True), fc.card("ZCMPTYPE",
                                         "RICE_1" if rice else "GZIP_1"),
        fc.card("ZBITPIX", 32 if rice else -64),
        fc.card("ZNAXIS", 2), fc.card("ZNAXIS1", n_vals),
        fc.card("ZNAXIS2", n_rows),
        fc.card("ZNAME1", "BLOCKSIZE"), fc.card("ZVAL1", 32),
        fc.card("ZNAME2", "BYTEPIX"), fc.card("ZVAL2", 4),
        fc.card("BSCALE", bscale), fc.card("BZERO", 0.0),
        fc.card("TIME", unix_s), fc.card("MILLITIM", 0),
        fc.end_card(),
    ])
    data = fc.pad_block(table + heap, b"\x00")
    return fc.pad_block(hdr) + data


def _primary() -> bytes:
    return fc.pad_block(b"".join([
        fc.card("SIMPLE", True), fc.card("BITPIX", 8),
        fc.card("NAXIS", 0), fc.end_card()]))


def test_rice_scan_matches_gzip_twin():
    """The same cells through both tile encodings parse identically
    (the Rice ints carry BSCALE=0.5, the legacy correlator scaling)."""
    rng = np.random.default_rng(3)
    tiles = (rng.integers(-1000, 1000, (4, 6, 2)) * 0.5).astype(np.float64)
    raw_rice = _primary() + _scan_hdu(tiles, rice=True)
    raw_gzip = _primary() + _scan_hdu(tiles, rice=False)
    scans_r = LG.parse_legacy_scans(raw_rice)
    scans_g = LG.parse_legacy_scans(raw_gzip)
    assert len(scans_r) == len(scans_g) == 1
    assert scans_r[0][0] == scans_g[0][0]
    np.testing.assert_array_equal(scans_r[0][1], scans_g[0][1])
    np.testing.assert_array_equal(scans_r[0][1], tiles)


def test_rice_unsupported_cmptype_still_raises():
    tiles = np.zeros((1, 2, 2))
    raw = (_primary() + _scan_hdu(tiles, rice=False)).replace(
        b"'GZIP_1'", b"'PLIO_1'")
    with pytest.raises(ValueError, match="ZCMPTYPE"):
        LG.parse_legacy_scans(raw)


def test_gzip2_and_gzip1_primary_rejected():
    """GZIP_2's byte-shuffled planes and GZIP_1 bytes in
    COMPRESSED_DATA would both decode into garbage floats (plain
    zlib / the Rice branch respectively) — the parser must reject
    them loudly instead."""
    tiles = np.zeros((1, 2, 2))
    raw2 = (_primary() + _scan_hdu(tiles, rice=False)).replace(
        b"'GZIP_1'", b"'GZIP_2'")
    with pytest.raises(ValueError, match="ZCMPTYPE"):
        LG.parse_legacy_scans(raw2)
    # GZIP_1 label with a NONZERO col-1 descriptor: take the Rice
    # variant's bytes (col 1 populated) and relabel it GZIP_1
    raw1 = (_primary() + _scan_hdu(tiles, rice=True)).replace(
        b"'RICE_1'", b"'GZIP_1'")
    with pytest.raises(ValueError, match="COMPRESSED_DATA"):
        LG.parse_legacy_scans(raw1)

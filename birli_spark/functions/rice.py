"""RICE_1 tile codec (the CFITSIO algorithm, Rice/Yeh/Miller) — the
compression legacy MWA gpubox files use for integer image tiles.
Reference scan path: ``sources/legacy_gpubox.py`` (cfitsio falls back to
gzip for float tiles, which is why real fixtures are gzip; Rice-coded
int tiles appear on older data — reference reads both via cfitsio,
src/io/mod.rs gpubox scan).

Decode follows cfitsio's ``fits_rdecomp``: a raw first pixel, then per
block of ``blocksize`` pixels a (fsbits)-bit split-position code and
Golomb-Rice-coded zigzag differences — fs = -1 means an all-same block,
fs = fsmax means raw ``8*bytepix``-bit copies. The encoder here is a
valid (not byte-identical to cfitsio: split position chosen by a
simpler rule) producer used for fixtures and the mwaf-style sinks'
tests; decode(encode(x)) == x for all int32 inputs.
"""

from __future__ import annotations

import numpy as np

_FS = {1: (3, 6), 2: (4, 14), 4: (5, 25)}


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, n: int) -> int:
        while self.nbits < n:
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        out = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return out

    def unary(self) -> int:
        """Count zero bits until (and consuming) the first 1 bit."""
        n = 0
        while True:
            if self.nbits == 0:
                self.acc = self.buf[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:
                n += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            n += self.nbits - top
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return n


def rice_decode(buf: bytes, npix: int, bytepix: int = 4,
                blocksize: int = 32) -> np.ndarray:
    """RICE_1 -> int array (dtype i{bytepix})."""
    fsbits, fsmax = _FS[bytepix]
    bits = 8 * bytepix
    r = _BitReader(buf)
    lastpix = r.take(bits)
    half = 1 << (bits - 1)
    if lastpix >= half:                      # sign-extend
        lastpix -= 1 << bits
    out = np.empty(npix, dtype=np.int64)
    i = 0
    while i < npix:
        fs = r.take(fsbits) - 1
        imax = min(i + blocksize, npix)
        if fs < 0:
            out[i:imax] = lastpix
            i = imax
            continue
        for j in range(i, imax):
            if fs == fsmax:
                diff = r.take(bits)
            else:
                diff = (r.unary() << fs) | r.take(fs) if fs else r.unary()
            if diff & 1:
                diff = -(diff >> 1) - 1
            else:
                diff >>= 1
            lastpix = diff + lastpix
            # wrap like the C int arithmetic
            lastpix = ((lastpix + half) % (1 << bits)) - half
            out[j] = lastpix
        i = imax
    return out.astype(f"i{bytepix}")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def rice_encode(a: np.ndarray, bytepix: int = 4,
                blocksize: int = 32) -> bytes:
    """int array -> RICE_1 stream that :func:`rice_decode` inverts."""
    fsbits, fsmax = _FS[bytepix]
    bits = 8 * bytepix
    vals = np.asarray(a, dtype=np.int64)
    w = _BitWriter()
    w.put(int(vals[0]) & ((1 << bits) - 1), bits)
    lastpix = int(vals[0])
    half = 1 << (bits - 1)
    i = 0
    n = len(vals)
    while i < n:
        imax = min(i + blocksize, n)
        diffs = []
        for j in range(i, imax):
            d = int(vals[j]) - lastpix
            d = ((d + half) % (1 << bits)) - half   # C wraparound
            lastpix = int(vals[j])
            diffs.append((d << 1) if d >= 0 else (~(d << 1)))
        if not any(diffs):
            w.put(0, fsbits)                         # fs = -1: all same
            i = imax
            continue
        # split position: keep the unary parts short (cfitsio picks the
        # entropy-optimal fs; any fs yields a decodable stream)
        mean = sum(diffs) // len(diffs)
        fs = max(0, mean.bit_length() - 1)
        if fs >= fsmax or max(diffs).bit_length() - fs > 48:
            w.put(fsmax + 1, fsbits)
            for d in diffs:
                w.put(d, bits)
        else:
            w.put(fs + 1, fsbits)
            for d in diffs:
                w.put(1, (d >> fs) + 1)              # unary + stop bit
                if fs:
                    w.put(d & ((1 << fs) - 1), fs)
        i = imax
    return w.flush()

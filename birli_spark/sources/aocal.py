"""S4 — AO calibration-solution ("MWAOCAL") binary scan (SURVEY.md §2.1;
reference ``AOCalSols::read_andre_binary``, src/io/aocal.rs:35-141).

Format (little-endian):

- 16-byte header: ASCII ``"MWAOCAL"`` + 9 zero bytes
  (src/io/aocal.rs:41-70);
- 4 × u32: num_timeblocks, num_tiles, num_chans, num_pols(=4)
  (src/io/aocal.rs:71-74);
- 2 × f64: start / end GPS seconds, 0.0 ⇒ absent (src/io/aocal.rs:75-87);
- f64 array ``[timeblock][tile][chan][2*num_pols]`` — re/im interleaved
  per polarisation (src/io/aocal.rs:88-112).

Timeblock start timestamps are reconstructed exactly like the reference's
"best effort" (evenly spaced between start and end,
src/io/aocal.rs:117-139).

The solutions table is dimension-sized (tiles × chans rows — KBs); it is
read driver-side with numpy and handed to Spark as a broadcast-joinable
DataFrame. At 100 TB scale this stays a driver-side dim load: calsols
never grow with data volume.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"MWAOCAL" + bytes(9)
_JONES_COLS = ("j00_re", "j00_im", "j01_re", "j01_im",
               "j10_re", "j10_im", "j11_re", "j11_im")


def write_mwaocal(path: str, di_jones: np.ndarray,
                  start_gps: float = 0.0, end_gps: float = 0.0) -> None:
    """Write solutions of shape [timeblock][tile][chan][8] (f64) in the
    MWAOCAL layout (the test/fixture counterpart of the reader)."""
    a = np.asarray(di_jones, dtype="<f8")
    if a.ndim != 4 or a.shape[3] != 8:
        raise ValueError(f"expected [tb][tile][chan][8], got {a.shape}")
    tb, tiles, chans, _ = a.shape
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<4I", tb, tiles, chans, 4))
        f.write(struct.pack("<2d", start_gps, end_gps))
        f.write(a.tobytes())


def read_mwaocal(path: str) -> tuple[np.ndarray, list[float]]:
    """Read an MWAOCAL file → (solutions [tb][tile][chan][8] f64,
    timeblock start GPS seconds)."""
    with open(path, "rb") as f:
        magic = f.read(16)
        if magic[:7] != b"MWAOCAL":
            raise ValueError(f"not an MWAOCAL file: magic={magic[:7]!r}")
        if any(magic[7:]):
            raise ValueError("non-zero reserved header bytes")
        tb, tiles, chans, npol = struct.unpack("<4I", f.read(16))
        if npol != 4:
            raise ValueError(f"expected 4 polarisations, got {npol}")
        start_gps, end_gps = struct.unpack("<2d", f.read(16))
        n = tb * tiles * chans * 2 * npol
        data = np.frombuffer(f.read(8 * n), dtype="<f8", count=n)
    sols = data.reshape(tb, tiles, chans, 2 * npol)
    # best-effort timeblock starts, exactly the reference's match arms
    # (src/io/aocal.rs:119-138): 0.0 encodes "absent"
    if start_gps == 0.0 and end_gps == 0.0:
        times: list[float] = []
    elif start_gps == 0.0:
        # (None, Some) — the reference panics on this invalid state
        raise ValueError(
            f"{path}: start GPS absent but end GPS = {end_gps}")
    elif end_gps == 0.0 or start_gps == end_gps or tb == 1:
        # single known instant (or a single timeblock, where "evenly
        # spaced" would divide by tb - 1 == 0)
        times = [start_gps]
    else:
        step = (end_gps - start_gps) / (tb - 1)
        times = [start_gps + i * step for i in range(tb)]
    return sols, times


def calsols_df(spark: SparkSession, path: str, timeblock: int = 0) -> DataFrame:
    """Load one timeblock as the (ant, chan, j…) dimension DataFrame the
    calibration operator broadcast-joins (single-timeblock selection
    mirrors the reference's assert, src/cli.rs:1639-1645)."""
    sols, _ = read_mwaocal(path)
    tb = sols[timeblock]
    rows = []
    for ant in range(tb.shape[0]):
        for chan in range(tb.shape[1]):
            rows.append((ant, chan, *[float(x) for x in tb[ant, chan]]))
    return spark.createDataFrame(rows, ["ant", "chan", *_JONES_COLS])


def write_synthetic_calsols(path: str, num_ants: int, num_chans: int,
                            start_gps: float = 0.0,
                            end_gps: float = 0.0) -> None:
    """Deterministic fixture file whose values equal the CALSOLS_SQL dim
    (sources/synthetic.py) — so a scan through the binary path can be
    oracle-checked against the same SQL."""
    a = np.zeros((1, num_ants, num_chans, 8))
    for ant in range(num_ants):
        for c in range(num_chans):
            a[0, ant, c] = [
                (100 + ant * 10 + c) / 100, (ant + c) / 100,
                (ant * 2 + c) / 1000, (ant + c * 2) / 1000,
                (ant * 3 + c) / 1000, (ant + c * 3) / 1000,
                (100 + ant * 5 + c * 2) / 100, (ant * 2 + c) / 100,
            ]
    write_mwaocal(path, a, start_gps, end_gps)

"""S1 — gpubox FITS scan as a *distributed* Spark source (SURVEY.md §2.1;
reference ``read_mwalib``, src/io/mod.rs:150-319).

The reference reads one FITS image HDU per (timestep, coarse channel) —
one file per coarse channel — with buffer layout
``[baseline][chan][pol][re, im]``, 8 f32 per channel
(src/io/mod.rs:195-199), parallel over coarse channels
(src/io/mod.rs:248-254). Baselines are upper-triangular including autos
in mwalib order.

Spark shape: ``spark.read.format("binaryFile")`` distributes whole files
to executors; an Arrow-batched ``mapInPandas`` parses each file's HDUs
into the long-format fact rows. File-level parallelism matches the
reference's per-coarse-channel rayon loop — and scales out: 24 files × N
obs spread over the cluster, no driver bottleneck. A production MWAX
layout (one HDU per timestep, ~100 MB–1 GB files) maps 1:1.

The synthetic fixture writer mirrors the reference's coordinate-encoded
test data design (reference tests/data/README.md: every cell value is a
closed-form function of its coordinates, here ``t*4096 + bl*256 +
chan*16 + pol_idx*2 + (0|1)`` — exact in f32), so a binary scan can be
oracle-checked against pure SQL that generates the same coordinates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from birli_spark.sources import fitscore as fc

FLOATS_PER_CHAN = 8  # 4 pols x (re, im) — src/io/mod.rs:195-199


def baseline_pairs(num_ants: int) -> list[tuple[int, int]]:
    """mwalib baseline order: upper triangular including autos."""
    return [(a1, a2) for a1 in range(num_ants) for a2 in range(a1, num_ants)]


def encoded_value(t: int, bl: int, chan: int, float_idx: int) -> float:
    """Closed-form cell value (f32-exact: < 2^24)."""
    return float(t * 4096 + bl * 256 + chan * 16 + float_idx)


def write_gpubox(path: str, cc_idx: int, num_ants: int, num_fine: int,
                 num_timesteps: int, obsid: int = 0,
                 gps_start: float = 0.0, int_time_s: float = 1.0,
                 skip_timesteps: tuple[int, ...] = ()) -> None:
    """Write a synthetic gpubox file: primary metadata HDU + one IMAGE HDU
    per timestep of shape (n_baselines, num_fine*8) f32, coordinate-
    encoded values. ``skip_timesteps`` omits HDUs to exercise the
    missing-slab path (S2)."""
    n_bl = len(baseline_pairs(num_ants))
    blobs = [fc.pad_block(b"".join([
        fc.card("SIMPLE", True), fc.card("BITPIX", 8), fc.card("NAXIS", 0),
        fc.card("OBSID", obsid), fc.card("CC_IDX", cc_idx),
        fc.card("NANTS", num_ants), fc.card("NCHANS", num_fine),
        fc.card("NSCANS", num_timesteps), fc.card("INTTIME", int_time_s),
        fc.card("GPSSTART", gps_start), fc.end_card()]))]
    for t in range(num_timesteps):
        if t in skip_timesteps:
            continue
        hdr = fc.pad_block(b"".join([
            fc.card("XTENSION", "IMAGE"), fc.card("BITPIX", -32),
            fc.card("NAXIS", 2), fc.card("NAXIS1", num_fine * FLOATS_PER_CHAN),
            fc.card("NAXIS2", n_bl), fc.card("PCOUNT", 0),
            fc.card("GCOUNT", 1),
            fc.card("MWATIME", int(gps_start + t * int_time_s)),
            fc.card("TSIDX", t), fc.end_card()]))
        data = np.empty((n_bl, num_fine * FLOATS_PER_CHAN), dtype=">f4")
        for bl in range(n_bl):
            for chan in range(num_fine):
                for k in range(FLOATS_PER_CHAN):
                    # encode the GLOBAL channel so files differ per cc
                    data[bl, chan * FLOATS_PER_CHAN + k] = encoded_value(
                        t, bl, cc_idx * num_fine + chan, k)
        blobs.append(hdr)
        blobs.append(fc.pad_block(data.tobytes(), b"\x00"))
    with open(path, "wb") as f:
        f.write(b"".join(blobs))


_SCAN_SCHEMA = ("t int, ant1 int, ant2 int, bl int, cc int, fc int, "
                "chan int, xx_re double, xx_im double, xy_re double, "
                "xy_im double, yx_re double, yx_im double, yy_re double, "
                "yy_im double")


def parse_gpubox_bytes(content: bytes) -> pd.DataFrame:
    """Parse one gpubox file into long-format rows (numpy-vectorized —
    no per-cell Python)."""
    header, off = fc.parse_header(content)
    cc = int(header["CC_IDX"])
    num_fine = int(header["NCHANS"])
    num_ants = int(header["NANTS"])
    pairs = np.asarray(baseline_pairs(num_ants))
    n_bl = len(pairs)
    frames = []
    while off < len(content):
        hdr, off = fc.parse_header(content, off)
        n = fc.data_size_bytes(hdr)
        data = np.frombuffer(content, dtype=">f4", count=n // 4,
                             offset=off).astype(np.float64)
        off = fc.skip_data(off, hdr)
        t = int(hdr["TSIDX"])
        cube = data.reshape(n_bl, num_fine, FLOATS_PER_CHAN)
        bl_idx = np.repeat(np.arange(n_bl), num_fine)
        fcs = np.tile(np.arange(num_fine), n_bl)
        flat = cube.reshape(n_bl * num_fine, FLOATS_PER_CHAN)
        frames.append(pd.DataFrame({
            "t": t, "ant1": pairs[bl_idx, 0], "ant2": pairs[bl_idx, 1],
            "bl": bl_idx, "cc": cc, "fc": fcs,
            "chan": cc * num_fine + fcs,
            "xx_re": flat[:, 0], "xx_im": flat[:, 1],
            "xy_re": flat[:, 2], "xy_im": flat[:, 3],
            "yx_re": flat[:, 4], "yx_im": flat[:, 5],
            "yy_re": flat[:, 6], "yy_im": flat[:, 7],
        }))
    if not frames:
        return pd.DataFrame(
            columns=["t", "ant1", "ant2", "bl", "cc", "fc", "chan",
                     "xx_re", "xx_im", "xy_re", "xy_im",
                     "yx_re", "yx_im", "yy_re", "yy_im"])
    return pd.concat(frames, ignore_index=True)


def read_gpubox(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed gpubox scan: binaryFile source → per-file FITS parse in
    Arrow batches. Each file (= coarse channel) is one task, like the
    reference's per-coarse-channel parallel read."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                out = parse_gpubox_bytes(bytes(content))
                if len(out):
                    yield out

    return files.select("content").mapInPandas(parse, schema=_SCAN_SCHEMA)


# --------------------------------------------- Python DataSource (V2) ---

def _arrow_scan_schema():
    import pyarrow as pa
    ints = ["t", "ant1", "ant2", "bl", "cc", "fc", "chan"]
    floats = ["xx_re", "xx_im", "xy_re", "xy_im",
              "yx_re", "yx_im", "yy_re", "yy_im"]
    return pa.schema([(c, pa.int32()) for c in ints]
                     + [(c, pa.float64()) for c in floats])


try:
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)

    class GpuboxDataSource(DataSource):
        """``spark.read.format("gpubox").load(glob)`` — the gpubox FITS
        scan as a first-class Spark (Python) data source.

        Planning: the driver globs the path into one
        :class:`InputPartition` per file, so parallelism = file count —
        the same per-coarse-channel task split as the reference's read
        (src/io/mod.rs:248-254) and as :func:`read_gpubox`. Each task
        parses its file numpy-vectorized and ships Arrow record batches
        to the JVM (no per-row Python). Register once per session:
        ``spark.dataSource.register(GpuboxDataSource)``.
        """

        @classmethod
        def name(cls) -> str:
            return "gpubox"

        def schema(self) -> str:
            return _SCAN_SCHEMA

        def reader(self, schema) -> "GpuboxReader":
            return GpuboxReader(self.options)

    class GpuboxReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("gpubox source requires a path")

        def partitions(self):
            import glob as globmod
            files = sorted(globmod.glob(self._path))
            if not files:
                raise FileNotFoundError(
                    f"no gpubox files match {self._path}")
            return [InputPartition(f) for f in files]

        def read(self, partition):
            import pyarrow as pa
            with open(partition.value, "rb") as f:
                content = f.read()
            pdf = parse_gpubox_bytes(content)
            table = pa.Table.from_pandas(
                pdf, preserve_index=False).cast(_arrow_scan_schema())
            yield from table.to_batches()

except ImportError:  # pragma: no cover — pyspark < 4 fallback
    GpuboxDataSource = None


def register_gpubox_source(spark: SparkSession) -> None:
    """Idempotently register the ``gpubox`` format on this session."""
    spark.dataSource.register(GpuboxDataSource)


def expected_grid_sql(num_cc: int, num_ants: int, num_fine: int,
                      num_timesteps: int) -> str:
    """DuckDB oracle: regenerate the coordinate-encoded cells in SQL —
    the closed-form twin of the binary files."""
    n_bl = len(baseline_pairs(num_ants))
    pol_cols = []
    names = ["xx_re", "xx_im", "xy_re", "xy_im",
             "yx_re", "yx_im", "yy_re", "yy_im"]
    for k, name in enumerate(names):
        pol_cols.append(
            f"CAST(CAST(t * 4096 + bl * 256 + chan * 16 + {k} AS FLOAT)"
            f" AS DOUBLE) AS {name}")
    return f"""
WITH ants AS (SELECT unnest(generate_series(0, {num_ants - 1})) AS a),
pairs AS (
  SELECT a1.a AS ant1, a2.a AS ant2,
    ROW_NUMBER() OVER (ORDER BY a1.a, a2.a) - 1 AS bl
  FROM ants a1 JOIN ants a2 ON a2.a >= a1.a),
grid AS (
  SELECT t.t, p.ant1, p.ant2, p.bl, c.cc, f.fc,
    CAST(c.cc * {num_fine} + f.fc AS INT) AS chan
  FROM (SELECT unnest(generate_series(0, {num_timesteps - 1})) AS t) t
  CROSS JOIN pairs p
  CROSS JOIN (SELECT unnest(generate_series(0, {num_cc - 1})) AS cc) c
  CROSS JOIN (SELECT unnest(generate_series(0, {num_fine - 1})) AS fc) f)
SELECT CAST(t AS INT) AS t, CAST(ant1 AS INT) AS ant1,
  CAST(ant2 AS INT) AS ant2, CAST(bl AS INT) AS bl, CAST(cc AS INT) AS cc,
  CAST(fc AS INT) AS fc, chan,
  {', '.join(pol_cols)}
FROM grid"""

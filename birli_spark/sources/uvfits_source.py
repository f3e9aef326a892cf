"""S1j — UVFITS random-groups files as a first-class Spark (Python)
data source: ``spark.read.format("uvfits").load(path)``.

The engine writes random-groups UVFITS (sinks/uvfits.py — the
reference's primary output, marlu ``write_vis``); this closes the loop
by reading them back DISTRIBUTED. Random groups are FIXED-SIZE records
(PCOUNT params + n_chan x 4 pol x 3 floats), so the file splits into
byte ranges with zero coordination: the driver parses only the header
blocks (cards until END — never the data), computes the record size,
and plans one :class:`InputPartition` per contiguous group range; each
task ``seek``s to ``header_len + lo * rec_size`` and reads exactly its
slice. Read bandwidth scales with executors on one file, the same
fixed-offset arithmetic the distributed WRITER uses in reverse
(sinks/uvfits.py::write_uvfits_distributed).

Row convention matches the established byte-gate read-back
(sinks/uvfits.py::file_cells_frame): one row per (group, channel) with
every value exactly as stored (all f32-exact doubles; DATE re-offset by
PZERO5; the pre-sized padding dropped — groups never written keep
bl_code 0, reindex-filled channels carry weight exactly 0), so the o1b
oracle gates this scan verbatim.
"""

from __future__ import annotations

import numpy as np

from birli_spark.sinks.uvfits import UVFITS_POLS

_BLOCK = 2880

_POL_COLS = ", ".join(f"{p}_re double, {p}_im double"
                      for p in UVFITS_POLS)
SCAN_SCHEMA = (f"bl_code int, jd double, chan_out int, u double,"
               f" v double, w double, {_POL_COLS}, weight double,"
               f" flag boolean")


def read_uvfits_header(path: str) -> tuple[dict, int]:
    """Parse ONLY the header blocks (80-char cards until END) ->
    (header dict, header length in bytes) — the planning step never
    touches group data."""
    header: dict[str, object] = {}
    off = 0
    with open(path, "rb") as f:
        done = False
        while not done:
            block = f.read(_BLOCK)
            if len(block) < _BLOCK:
                raise ValueError(f"{path}: truncated FITS header")
            off += _BLOCK
            for i in range(0, _BLOCK, 80):
                card = block[i:i + 80].decode("ascii")
                key = card[:8].strip()
                if key == "END":
                    done = True
                    break
                if "=" not in card:
                    continue
                val = card[9:].split("/")[0].strip()
                if val.startswith("'"):
                    header[key] = val.strip("'").strip()
                elif val in ("T", "F"):
                    header[key] = val == "T"
                else:
                    header[key] = float(val) if "." in val else int(val)
    if not header.get("GROUPS", False):
        raise ValueError(f"{path}: not a random-groups UVFITS file")
    return header, off


def decode_group_range(path: str, header: dict, header_len: int,
                       lo: int, hi: int):
    """Rows for groups [lo, hi): one seek + one read of the exact byte
    slice, numpy-vectorized into the file_cells_frame row convention."""
    import pandas as pd

    n_chan = int(header["NAXIS4"])
    per = int(header["PCOUNT"]) + n_chan * 4 * 3
    pzero_date = float(header.get("PZERO5", 0.0))
    n = hi - lo
    with open(path, "rb") as f:
        f.seek(header_len + lo * per * 4)
        raw = f.read(n * per * 4)
    arr = np.frombuffer(raw, dtype=">f4").reshape(n, per)
    params = arr[:, :5].astype(np.float64)
    data = arr[:, 5:].reshape(n, n_chan, 4, 3).astype(np.float64)
    rec = {
        "bl_code": np.repeat(params[:, 3].astype(np.int32), n_chan),
        "jd": np.repeat(params[:, 4] + pzero_date, n_chan),
        "chan_out": np.tile(np.arange(n_chan, dtype=np.int32), n),
        "u": np.repeat(params[:, 0], n_chan),
        "v": np.repeat(params[:, 1], n_chan),
        "w": np.repeat(params[:, 2], n_chan),
    }
    for p, pol in enumerate(UVFITS_POLS):
        rec[f"{pol}_re"] = data[:, :, p, 0].reshape(-1)
        rec[f"{pol}_im"] = data[:, :, p, 1].reshape(-1)
    rec["weight"] = data[:, :, 0, 2].reshape(-1)
    pdf = pd.DataFrame(rec)
    pdf["flag"] = pdf["weight"] < 0
    # drop the pre-sized padding (file_cells_frame convention)
    return pdf[(pdf["bl_code"] > 0) & (pdf["weight"] != 0.0)]


def register_uvfits_source(spark) -> None:
    """Register ``spark.read.format("uvfits")`` (idempotent). Options:
    ``groups_per_task`` (default 512) sets the planning granularity."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)

    class UvfitsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "uvfits"

        def schema(self) -> str:
            return SCAN_SCHEMA

        def reader(self, schema) -> "UvfitsReader":
            return UvfitsReader(self.options)

    class UvfitsReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("uvfits source requires a path")
            self._gpt = int(options.get("groups_per_task", 512))

        def partitions(self):
            header, hlen = read_uvfits_header(self._path)
            g = int(header["GCOUNT"])
            meta = (self._path, header, hlen)
            return [InputPartition((meta, lo, min(lo + self._gpt, g)))
                    for lo in range(0, g, self._gpt)]

        def read(self, partition):
            import pyarrow as pa
            (path, header, hlen), lo, hi = partition.value
            pdf = decode_group_range(path, header, hlen, lo, hi)
            if len(pdf):
                table = pa.Table.from_pandas(pdf, preserve_index=False)
                yield from table.to_batches()

    spark.dataSource.register(UvfitsDataSource)

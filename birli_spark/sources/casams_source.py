"""S1k — the engine's casacore-layout Measurement Sets as a Spark
(Python) data source: ``spark.read.format("casams").load(path.ms)``.

The symmetric read of the O2c physical writer: MAIN's ``table.f0``
holds only FIXED-SIZE cells at offsets computable from the column
metadata (sinks/ms_file.py::plan_f0_layout — the same arithmetic the
executor-parallel pwrite uses), so the driver plans ROW-RANGE
partitions from ``table.dat`` alone, and each task seeks to every
needed column's ``base + lo * cell_size`` and decodes exactly its
slice. Two scale properties fall out for free:

- **read bandwidth scales with executors on one table** (like the
  UVFITS source, sources/uvfits_source.py), and
- **column pruning is physical**: only the 8 columns the row
  convention needs are ever read — the other 14 MAIN columns' byte
  regions are never touched.

Row convention matches the established MS byte-gate read-back
(sinks/ms_file.py::main_cells_frame), so the o2c oracle gates the
scan verbatim.
"""

from __future__ import annotations

import os

import numpy as np

from birli_spark.sinks import casa_tables
from birli_spark.sinks.ms_file import MS_POLS, plan_f0_layout

_POL_COLS = ", ".join(f"data_{p}_re double, data_{p}_im double"
                      for p in MS_POLS)
SCAN_SCHEMA = (f"time_mjd_s double, antenna1 int, antenna2 int,"
               f" time_block int, chan int, uvw_u double, uvw_v double,"
               f" uvw_w double, {_POL_COLS}, weight double, flag boolean")

#: the columns the row convention consumes — the only byte regions read
_NEEDED = ("TIME", "ANTENNA1", "ANTENNA2", "SCAN_NUMBER", "UVW",
           "WEIGHT_SPECTRUM", "FLAG", "DATA")

_NP = {"bool": "u1", "int": ">i4", "float": ">f4", "double": ">f8",
       "complex": ">c8"}


def read_main_desc(ms_path: str) -> tuple[int, list[dict]]:
    """Parse ONLY the MAIN ``table.dat`` -> (nrow, columns meta in file
    order) via the shared parser (casa_tables.read_table_desc) — the
    planning step never opens ``table.f0``. Every column must be
    StManAipsIO-managed: :func:`plan_f0_layout`'s fixed-cell offsets
    are ONLY valid for that layout, so a genuine casacore-written MS
    (Tiled/Incr storage managers, different f0 framing) is rejected
    with a clear error instead of decoding wrong byte regions."""
    _, nrow, _, descs = casa_tables.read_table_desc(ms_path)
    bad = [(d["name"], d["dm_type"]) for d in descs
           if d["dm_type"] != "StManAipsIO"]
    if bad:
        raise ValueError(
            f"{ms_path}: unsupported storage manager(s) {bad[:4]} — the"
            " casams source reads the StManAipsIO fixed-cell layout"
            " this engine writes (sinks/ms_file.py), not general"
            " casacore tables")
    return nrow, [{"name": d["name"], "shape": d["shape"],
                   "dtype": d["dtype"]} for d in descs]


def _read_column_rows(f, meta: dict, base: int, cell: int,
                      lo: int, hi: int) -> np.ndarray:
    """Decode rows [lo, hi) of one column: one seek + one read of the
    exact byte slice; array cells strip their [ndim][dims] prefix."""
    n = hi - lo
    f.seek(base + lo * cell)
    raw = f.read(n * cell)
    shape = meta.get("shape")
    dt = _NP[meta["dtype"]]
    if shape is None:
        a = np.frombuffer(raw, dtype=dt)
        return a.astype(bool) if meta["dtype"] == "bool" else a
    prefix = 4 + 4 * len(shape)
    cells = np.frombuffer(raw, dtype="u1").reshape(n, cell)
    pay = np.ascontiguousarray(cells[:, prefix:]).view(dt) \
        .reshape(n, *shape)
    return pay.astype(bool) if meta["dtype"] == "bool" else pay


def decode_row_range(ms_path: str, nrow: int, metas: list[dict],
                     lo: int, hi: int, time_block_offset: int = 0):
    """Rows [lo, hi) via the SHARED row convention
    (sinks/ms_file.py::cells_frame_from_columns — the same builder the
    driver byte gates use) — only the _NEEDED columns' byte regions are
    touched."""
    from birli_spark.sinks.ms_file import cells_frame_from_columns

    _, sections, _ = plan_f0_layout(metas, nrow)
    by_name = {m["name"]: m for m in metas}
    cols = {}
    with open(os.path.join(ms_path, "table.f0"), "rb") as f:
        for name in _NEEDED:
            base, cell = sections[name]
            cols[name] = _read_column_rows(f, by_name[name], base, cell,
                                           lo, hi)
    pdf = cells_frame_from_columns(cols, hi - lo,
                                   time_block_offset=time_block_offset)
    # Arrow batches bind to the declared schema BY POSITION — emit in
    # SCAN_SCHEMA column order (the shared builder orders weight/flag
    # before the pol columns)
    order = [c.strip().split(" ")[0] for c in SCAN_SCHEMA.split(",")]
    return pdf[order]


def register_casams_source(spark) -> None:
    """Register ``spark.read.format("casams")`` (idempotent). Options:
    ``rows_per_task`` (default 4096), ``time_block_offset``."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition)

    class CasaMsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "casams"

        def schema(self) -> str:
            return SCAN_SCHEMA

        def reader(self, schema) -> "CasaMsReader":
            return CasaMsReader(self.options)

    class CasaMsReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("casams source requires a path")
            self._rpt = int(options.get("rows_per_task", 4096))
            self._tbo = int(options.get("time_block_offset", 0))

        def partitions(self):
            nrow, metas = read_main_desc(self._path)
            meta_tuple = (self._path, nrow, metas, self._tbo)
            return [InputPartition((meta_tuple, lo,
                                    min(lo + self._rpt, nrow)))
                    for lo in range(0, nrow, self._rpt)]

        def read(self, partition):
            import pyarrow as pa
            (path, nrow, metas, tbo), lo, hi = partition.value
            pdf = decode_row_range(path, nrow, metas, lo, hi,
                                   time_block_offset=tbo)
            if len(pdf):
                table = pa.Table.from_pandas(pdf, preserve_index=False)
                yield from table.to_batches()

    spark.dataSource.register(CasaMsDataSource)

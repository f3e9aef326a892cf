"""casacore-layout table directory writer/reader (no casacore needed).

A casacore table on disk is a directory holding ``table.dat`` (the
Table + TableDesc + column-set stream, casacore
``tables/Tables/PlainTable.cc::writeFile``), ``table.info`` (plain-text
type/subtype/readme, ``tables/Tables/TableInfo.cc``), and one file per
data manager (``table.f0`` here — all columns bound to StManAipsIO, the
simplest of casacore's storage managers: it serializes every column in
full through AipsIO, ``tables/DataMan/StManAipsIO.cc``). Subtables are
nested directories referenced by TpTable keywords on the parent, which
is exactly how a MeasurementSet hangs its ANTENNA/SPECTRAL_WINDOW/...
tree off the MAIN table (reference Birli writes the same tree through
marlu/casacore, ``src/io/mod.rs:542-595``).

See :mod:`birli_spark.sinks.casa_io` for the validation boundary: the
reader below is an independent parser, and the round-trip (write →
parse → cell-for-cell compare) is the gate; byte parity with a real
casacore build is best-effort, unverifiable without casacore.

Column spec: ``{"name": str, "dtype": one of bool/int/float/double/
string/complex, "shape": None for scalar | tuple for fixed-shape
arrays}``. Array cells are numpy arrays in C order.
"""

from __future__ import annotations

import os

import numpy as np

from birli_spark.sinks.casa_io import (
    TP_ARRAY_OFFSET, TP_BOOL, TP_COMPLEX, TP_DOUBLE, TP_FLOAT, TP_INT,
    TP_STRING, TP_TABLE, AipsReader, AipsWriter)

_TP = {"bool": TP_BOOL, "int": TP_INT, "float": TP_FLOAT,
       "double": TP_DOUBLE, "string": TP_STRING, "complex": TP_COMPLEX}
_TP_INV = {v: k for k, v in _TP.items()}
_NP = {"bool": np.bool_, "int": np.int32, "float": np.float32,
       "double": np.float64, "complex": np.complex64}


def _put_scalar(w: AipsWriter, dtype: str, v) -> None:
    if dtype == "bool":
        w.put_bool(bool(v))
    elif dtype == "int":
        w.put_int(int(v))
    elif dtype == "float":
        w.put_float(float(v))
    elif dtype == "double":
        w.put_double(float(v))
    elif dtype == "string":
        w.put_string(str(v))
    elif dtype == "complex":
        c = complex(v)
        w.put_float(c.real)
        w.put_float(c.imag)
    else:  # pragma: no cover
        raise ValueError(dtype)


def _get_scalar(r: AipsReader, dtype: str):
    if dtype == "bool":
        return r.get_bool()
    if dtype == "int":
        return r.get_int()
    if dtype == "float":
        return r.get_float()
    if dtype == "double":
        return r.get_double()
    if dtype == "string":
        return r.get_string()
    if dtype == "complex":
        return complex(r.get_float(), r.get_float())
    raise ValueError(dtype)  # pragma: no cover


def _put_keywords(w: AipsWriter, keywords: dict) -> None:
    """TableRecord stream (tables/Tables/TableRecord.h): field count,
    then (name, DataType, value) triples. TpTable values carry the
    subtable's directory name relative to the parent."""
    w.putstart("TableRecord", 1)
    w.put_uint(len(keywords))
    for name, (dtype, value) in keywords.items():
        w.put_string(name)
        if dtype == "table":
            w.put_int(TP_TABLE)
            w.put_string(str(value))
        else:
            w.put_int(_TP[dtype])
            _put_scalar(w, dtype, value)
    w.putend()


def _get_keywords(r: AipsReader) -> dict:
    r.getstart("TableRecord")
    out = {}
    for _ in range(r.get_uint()):
        name = r.get_string()
        tp = r.get_int()
        if tp == TP_TABLE:
            out[name] = ("table", r.get_string())
        else:
            dtype = _TP_INV[tp]
            out[name] = (dtype, _get_scalar(r, dtype))
    r.getend()
    return out


def write_table(path: str, name: str, columns: list[dict],
                nrow: int, *, keywords: dict | None = None,
                info_type: str = "", info_subtype: str = "",
                readme: str = "") -> None:
    """Emit ``path/{table.dat,table.f0,table.info}``.

    ``columns[i]["values"]``: length-``nrow`` sequence — scalars for
    scalar columns, C-order numpy arrays of ``shape`` for array
    columns.
    """
    os.makedirs(path, exist_ok=True)
    write_table_dat(path, name, columns, nrow, keywords=keywords,
                    info_type=info_type, info_subtype=info_subtype,
                    readme=readme)

    # ---- table.f0: StManAipsIO{seqnr, nrow, ncol, per-column data}
    w = AipsWriter()
    w.putstart("StManAipsIO", 2)
    w.put_uint(0)
    w.put_uint(nrow)
    w.put_uint(len(columns))
    for col in columns:
        dtype, shape = col["dtype"], col.get("shape")
        w.putstart("StManColumnAipsIO", 2)
        w.put_int(_TP[dtype] + (0 if shape is None else TP_ARRAY_OFFSET))
        w.put_uint(nrow)
        vals = col["values"]
        if shape is None:
            for v in vals:
                _put_scalar(w, dtype, v)
        else:
            for cell in vals:
                a = np.ascontiguousarray(cell)
                if tuple(a.shape) != tuple(shape):
                    raise ValueError(
                        f"{col['name']}: cell shape {a.shape} != "
                        f"declared {shape}")
                w.put_uint(a.ndim)
                for d in a.shape:
                    w.put_int(d)
                if dtype == "string":
                    for s in a.reshape(-1):
                        w.put_string(str(s))
                elif dtype == "complex":
                    w.put_bytes(a.astype(">c8").tobytes())
                else:
                    w.put_bytes(a.astype(
                        {"bool": ">u1", "int": ">i4", "float": ">f4",
                         "double": ">f8"}[dtype]).tobytes())
        w.putend()
    w.putend()
    with open(os.path.join(path, "table.f0"), "wb") as f:
        f.write(w.getvalue())


def write_table_dat(path: str, name: str, columns: list[dict],
                    nrow: int, *, keywords: dict | None = None,
                    info_type: str = "", info_subtype: str = "",
                    readme: str = "") -> None:
    """``table.dat`` + ``table.info`` only — the shared serializer for
    both :func:`write_table` (which adds the full ``table.f0``) and the
    MS MAIN writer (sinks/ms_file.py, whose f0 bulk goes through the
    executor-parallel path). ``columns`` need only name/dtype/shape
    (+optional comment/keywords) here — values are f0's business."""
    os.makedirs(path, exist_ok=True)
    keywords = keywords or {}

    # ---- table.dat: Table{nrow, format, name, TableDesc, ColumnSet}
    w = AipsWriter()
    w.putstart("Table", 2)
    w.put_uint(nrow)
    w.put_uint(0)  # storage option: canonical big-endian
    w.put_string(name)
    w.putstart("TableDesc", 2)
    w.put_string(name)
    w.put_string("")  # desc version tag
    w.put_string("")  # comment
    _put_keywords(w, keywords)
    w.put_uint(len(columns))
    for col in columns:
        shape = col.get("shape")
        w.putstart("ColumnDesc", 1)
        w.put_string(col["name"])
        w.put_string(col.get("comment", ""))
        w.put_string("StManAipsIO")  # dataManagerType
        w.put_string("StManAipsIO")  # dataManagerGroup
        tp = _TP[col["dtype"]]
        w.put_int(tp if shape is None else tp + TP_ARRAY_OFFSET)
        w.put_int(0)  # options
        w.put_int(0 if shape is None else len(shape))
        if shape is not None:
            w.put_bool(True)  # fixed shape
            for d in shape:
                w.put_int(d)
        _put_keywords(w, col.get("keywords", {}))
        w.putend()
    w.putend()  # TableDesc
    w.putstart("ColumnSet", 1)
    w.put_uint(nrow)
    w.put_uint(1)  # one data manager
    w.put_string("StManAipsIO")
    w.put_uint(0)  # seqnr -> table.f0
    w.putend()
    w.putend()  # Table
    with open(os.path.join(path, "table.dat"), "wb") as f:
        f.write(w.getvalue())

    # ---- table.info (TableInfo::flush layout: plain text)
    with open(os.path.join(path, "table.info"), "w") as f:
        f.write(f"Type = {info_type}\nSubType = {info_subtype}\n\n")
        if readme:
            f.write(readme if readme.endswith("\n") else readme + "\n")


def read_table_desc(path: str) -> tuple[str, int, dict, list[dict]]:
    """Parse ONLY ``table.dat`` -> (name, nrow, keywords, column descs
    incl. the data-manager type per column) — shared by the full
    roundtrip reader and the distributed MS DataSource's planner
    (sources/casams_source.py), which never opens ``table.f0``."""
    with open(os.path.join(path, "table.dat"), "rb") as f:
        r = AipsReader(f.read())
    r.getstart("Table")
    nrow = r.get_uint()
    r.get_uint()  # format
    name = r.get_string()
    r.getstart("TableDesc")
    r.get_string(), r.get_string(), r.get_string()
    keywords = _get_keywords(r)
    descs = []
    for _ in range(r.get_uint()):
        r.getstart("ColumnDesc")
        cname = r.get_string()
        r.get_string()  # comment
        dm_type = r.get_string()
        dm_group = r.get_string()
        tp = r.get_int()
        r.get_int()  # options
        ndim = r.get_int()
        shape = None
        if ndim > 0:
            r.get_bool()
            shape = tuple(r.get_int() for _ in range(ndim))
        ckw = _get_keywords(r)
        r.getend()
        is_arr = tp >= TP_ARRAY_OFFSET
        descs.append({"name": cname, "shape": shape, "keywords": ckw,
                      "dm_type": dm_type, "dm_group": dm_group,
                      "dtype": _TP_INV[tp - TP_ARRAY_OFFSET if is_arr
                                       else tp]})
    r.getend()  # TableDesc
    r.getstart("ColumnSet")
    assert r.get_uint() == nrow
    for _ in range(r.get_uint()):
        r.get_string(), r.get_uint()
    r.getend()
    r.getend()  # Table
    return name, nrow, keywords, descs


def read_table(path: str) -> dict:
    """Parse a directory written by :func:`write_table` back into
    ``{"name", "nrow", "keywords", "columns": {col: np.ndarray}}``.
    Array columns come back stacked ``(nrow, *shape)``; fully
    independent of the writer (format-description parity check)."""
    name, nrow, keywords, descs = read_table_desc(path)

    with open(os.path.join(path, "table.f0"), "rb") as f:
        r = AipsReader(f.read())
    r.getstart("StManAipsIO")
    r.get_uint()
    assert r.get_uint() == nrow
    ncol = r.get_uint()
    assert ncol == len(descs)
    columns: dict[str, np.ndarray] = {}
    for desc in descs:
        r.getstart("StManColumnAipsIO")
        r.get_int()
        assert r.get_uint() == nrow
        dtype, shape = desc["dtype"], desc["shape"]
        if shape is None:
            if dtype == "string":
                columns[desc["name"]] = np.array(
                    [r.get_string() for _ in range(nrow)], dtype=object)
            else:
                columns[desc["name"]] = np.array(
                    [_get_scalar(r, dtype) for _ in range(nrow)],
                    dtype=_NP[dtype])
        else:
            cells = []
            n_el = int(np.prod(shape)) if shape else 1
            for _ in range(nrow):
                ndim = r.get_uint()
                dims = tuple(r.get_int() for _ in range(ndim))
                assert dims == shape, (dims, shape)
                if dtype == "string":
                    cells.append(np.array(
                        [r.get_string() for _ in range(n_el)],
                        dtype=object).reshape(shape))
                else:
                    fmt = {"bool": ">u1", "int": ">i4", "float": ">f4",
                           "double": ">f8", "complex": ">c8"}[dtype]
                    nb = n_el * np.dtype(fmt).itemsize
                    cells.append(np.frombuffer(
                        r._d, dtype=fmt, count=n_el,
                        offset=r._p).reshape(shape))
                    r._p += nb
            stacked = np.stack(cells) if nrow else np.zeros(
                (0, *shape), dtype=_NP.get(dtype, object))
            if dtype != "string":
                stacked = stacked.astype(_NP[dtype])  # native byte order
            columns[desc["name"]] = stacked
        r.getend()
    r.getend()
    return {"name": name, "nrow": nrow, "keywords": keywords,
            "columns": columns,
            "descs": {d["name"]: d for d in descs}}

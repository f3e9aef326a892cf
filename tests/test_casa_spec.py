"""O2c spec-conformance suite (VERDICT r3 ask 4): field-by-field
assertions of the ``table.dat`` / ``table.f0`` byte structure against
the PUBLIC casacore format documentation — not just roundtrip identity
through our own parser. Every magic word, object version, DataType tag,
and required-keyword set is enumerated with its spec citation; the
walker below is a deliberately independent struct-based parse (it never
imports AipsReader), so a codec bug cannot self-confirm.

Spec sources (all public casacore):
- AipsIO stream framing: ``casa/IO/AipsIO.{h,cc}`` — a magic uInt opens
  the stream; each object is ``[uInt objlen][String type][uInt version]
  ... payload`` with objlen back-patched by putend to cover everything
  from its own first byte to the object's end.
- Canonical primitive encodings: ``casa/OS/CanonicalConversion.h`` —
  Bool 1 byte, Int/uInt 4-byte big-endian, Int64 8-byte BE, float/
  double IEEE BE, String = uInt length + raw bytes, Complex = 2 floats.
- DataType enum values: ``casa/Utilities/DataType.h`` — TpBool=0,
  TpChar, TpUChar, TpShort, TpUShort, TpInt=5, TpUInt, TpFloat=7,
  TpDouble=8, TpComplex=9, TpDComplex, TpString=11; the matching
  TpArray* block starts at 13 (TpArrayBool) so array tag = scalar + 13.
- Table file layout: ``tables/Tables/Table.h`` + ``PlainTable.cc`` —
  ``table.dat`` holds Table{nrow, format, name, TableDesc, ColumnSet},
  ``table.f<seqnr>`` one file per storage manager, ``table.info`` the
  TableInfo flush (plain text ``Type = ...`` / ``SubType = ...``).
- MS v2 required-subtable set: the MeasurementSet v2 definition
  (Kemball & Wieringa 2000, ``ms/MeasurementSets/MeasurementSet.h``).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from birli_spark.sinks import casa_tables, ms_file, ms_subtables

MAGIC = 0xBEBEBEBE

# casa/Utilities/DataType.h
TP = {"bool": 0, "int": 5, "uint": 6, "float": 7, "double": 8,
      "complex": 9, "string": 11}
TP_ARRAY = 13  # TpArrayBool — the array block offset


class Walk:
    """Independent canonical-stream walker (struct only)."""

    def __init__(self, b: bytes):
        self.b = b
        self.o = 0

    def u32(self):
        (v,) = struct.unpack_from(">I", self.b, self.o)
        self.o += 4
        return v

    def i32(self):
        (v,) = struct.unpack_from(">i", self.b, self.o)
        self.o += 4
        return v

    def boolean(self):
        v = self.b[self.o]
        self.o += 1
        assert v in (0, 1)
        return bool(v)

    def string(self):
        n = self.u32()
        s = self.b[self.o:self.o + n].decode()
        self.o += n
        return s

    def obj(self, expect_type: str, expect_version: int):
        """Enter a nested object; returns (version, end_offset)."""
        start = self.o
        objlen = self.u32()
        typ = self.string()
        assert typ == expect_type, (typ, expect_type)
        ver = self.u32()
        assert ver == expect_version, (expect_type, ver, expect_version)
        # AipsIO putend back-patches objlen to span [start, end)
        return ver, start + objlen

    def keywords_record(self):
        """TableRecord serialization (tables/Tables/TableRecord.h): a
        nested AipsIO object "TableRecord" v1 holding uInt count, then
        (String name, Int dtype, value) triples. Returns
        {name: (dtype_tag, value_offset)}."""
        _, end = self.obj("TableRecord", 1)
        n = self.u32()
        out = {}
        for _ in range(n):
            name = self.string()
            tag = self.i32()
            here = self.o
            # skip the value by dtype
            if tag == TP["bool"]:
                self.o += 1
            elif tag in (TP["int"], TP["uint"]):
                self.o += 4
            elif tag == TP["float"]:
                self.o += 4
            elif tag == TP["double"]:
                self.o += 8
            elif tag == TP["string"]:
                self.string()
            elif tag == 12:  # TpTable — subtable reference by name
                self.string()
            else:
                raise AssertionError(f"unexpected keyword dtype {tag}")
            out[name] = (tag, here)
        assert self.o == end                 # putend back-patch exact
        return out


COLUMNS = [
    dict(name="FLAG_ROW", dtype="bool", values=[False, True]),
    dict(name="ANT", dtype="int", values=[3, 4]),
    dict(name="TIME", dtype="double", values=[1.5, 2.5]),
    dict(name="NAME", dtype="string", values=["a", "bb"]),
    dict(name="POS", dtype="double", shape=(3,),
         values=[np.arange(3.0), np.arange(3.0) + 10]),
    dict(name="VIS", dtype="complex", shape=(2, 4),
         values=[np.ones((2, 4), ">c8"), np.zeros((2, 4), ">c8")]),
]


@pytest.fixture()
def table_dir(tmp_path):
    p = str(tmp_path / "SPEC")
    casa_tables.write_table(p, "SPEC", COLUMNS, nrow=2,
                            keywords={"MS_VERSION": ("float", 2.0)},
                            info_type="Measurement Set",
                            info_subtype="MWA")
    return p


def test_table_dat_field_layout(table_dir):
    w = Walk(open(f"{table_dir}/table.dat", "rb").read())
    # stream opens with the AipsIO magic word (AipsIO.cc magicval_p)
    assert w.u32() == MAGIC
    _, table_end = w.obj("Table", 2)
    assert w.u32() == 2                      # nrow
    assert w.u32() == 0                      # format: canonical BE
    assert w.string() == "SPEC"              # table name
    _, desc_end = w.obj("TableDesc", 2)
    assert w.string() == "SPEC"              # desc name
    assert w.string() == ""                  # desc version tag
    assert w.string() == ""                  # comment
    kw = w.keywords_record()
    assert set(kw) == {"MS_VERSION"}
    assert kw["MS_VERSION"][0] == TP["float"]
    (msv,) = struct.unpack_from(">f", w.b, kw["MS_VERSION"][1])
    assert msv == 2.0
    assert w.u32() == len(COLUMNS)           # column count
    for col in COLUMNS:
        _, col_end = w.obj("ColumnDesc", 1)
        assert w.string() == col["name"]
        w.string()                           # comment
        assert w.string() == "StManAipsIO"   # dataManagerType
        assert w.string() == "StManAipsIO"   # dataManagerGroup
        shape = col.get("shape")
        want_tag = TP[col["dtype"]] + (0 if shape is None else TP_ARRAY)
        assert w.i32() == want_tag           # DataType.h enum value
        assert w.i32() == 0                  # options
        assert w.i32() == (0 if shape is None else len(shape))
        if shape is not None:
            assert w.boolean() is True       # FixedShape
            assert tuple(w.i32() for _ in shape) == tuple(shape)
        assert w.keywords_record() == {}
        assert w.o == col_end                # putend back-patch exact
    assert w.o == desc_end
    _, cs_end = w.obj("ColumnSet", 1)
    assert w.u32() == 2                      # nrow again
    assert w.u32() == 1                      # one data manager
    assert w.string() == "StManAipsIO"
    assert w.u32() == 0                      # seqnr -> table.f0
    assert w.o == cs_end
    assert w.o == table_end
    assert w.o == len(w.b)                   # nothing after the Table


def test_table_f0_field_layout(table_dir):
    w = Walk(open(f"{table_dir}/table.f0", "rb").read())
    assert w.u32() == MAGIC
    _, end = w.obj("StManAipsIO", 2)
    assert w.u32() == 0                      # seqnr
    assert w.u32() == 2                      # nrow
    assert w.u32() == len(COLUMNS)           # ncol
    for col in COLUMNS:
        _, col_end = w.obj("StManColumnAipsIO", 2)
        shape = col.get("shape")
        want_tag = TP[col["dtype"]] + (0 if shape is None else TP_ARRAY)
        assert w.i32() == want_tag
        assert w.u32() == 2                  # nrow in this column
        if shape is None:
            sizes = {"bool": 1, "int": 4, "double": 8}
            if col["dtype"] == "string":
                for _ in range(2):
                    w.string()
            else:
                w.o += 2 * sizes[col["dtype"]]
        else:
            cell = int(np.prod(shape))
            unit = {"double": 8, "complex": 8}[col["dtype"]]
            for _ in range(2):
                assert w.u32() == len(shape)         # ndim
                assert tuple(w.i32() for _ in shape) == tuple(shape)
                w.o += cell * unit                   # BE payload
        assert w.o == col_end
    assert w.o == end == len(w.b)


def test_scalar_encodings_are_canonical_big_endian(table_dir):
    """CanonicalConversion primitive encodings, checked on raw bytes:
    the double column's first value 1.5 must appear as its IEEE754
    big-endian image inside table.f0."""
    b = open(f"{table_dir}/table.f0", "rb").read()
    assert struct.pack(">d", 1.5) in b
    assert struct.pack(">d", 2.5) in b
    # int 3, 4 as 4-byte BE
    assert struct.pack(">ii", 3, 4) in b
    # string "bb" as uInt-length-prefixed raw bytes
    assert struct.pack(">I", 2) + b"bb" in b


def test_table_info_flush_layout(table_dir):
    txt = open(f"{table_dir}/table.info").read()
    assert txt.startswith("Type = Measurement Set\nSubType = MWA\n\n")


def test_ms_main_keyword_set(tmp_path):
    """The MAIN table.dat must carry MS_VERSION = 2.0 (float) and a
    TpTable keyword per REQUIRED MS v2 subtable (MeasurementSet.h /
    Kemball & Wieringa 2000) that this writer materializes."""
    meta = ms_file._main_columns_meta(4)
    keywords = {"MS_VERSION": ("float", 2.0)}
    for name in ms_subtables.subtable_sqls(avg_freq=2):
        keywords[name] = ("table", name)
    p = str(tmp_path / "main.ms")
    ms_file._write_main_dat(p, meta, 8, keywords)
    w = Walk(open(f"{p}/table.dat", "rb").read())
    assert w.u32() == MAGIC
    w.obj("Table", 2)
    assert w.u32() == 8
    assert w.u32() == 0
    w.string()
    w.obj("TableDesc", 2)
    w.string(); w.string(); w.string()
    kw = w.keywords_record()
    required = {"ANTENNA", "DATA_DESCRIPTION", "FEED", "FIELD",
                "OBSERVATION", "POLARIZATION", "PROCESSOR",
                "SPECTRAL_WINDOW", "STATE", "HISTORY"}
    assert required <= set(kw)
    assert kw["MS_VERSION"][0] == TP["float"]
    for name in required:
        assert kw[name][0] == 12             # TpTable reference
    # MAIN column tags: DATA is TpArrayComplex (9+13), UVW
    # TpArrayDouble (8+13), ANTENNA1 TpInt, FLAG TpArrayBool (0+13)
    n = w.u32()
    tags = {}
    for _ in range(n):
        _, col_end = w.obj("ColumnDesc", 1)
        name = w.string()
        w.string(); w.string(); w.string()
        tags[name] = w.i32()
        w.o = col_end
    assert tags["DATA"] == TP["complex"] + TP_ARRAY
    assert tags["UVW"] == TP["double"] + TP_ARRAY
    assert tags["FLAG"] == TP["bool"] + TP_ARRAY
    assert tags["ANTENNA1"] == TP["int"]
    assert tags["TIME"] == TP["double"]

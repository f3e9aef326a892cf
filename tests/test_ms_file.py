"""O2c — physical casacore-layout Measurement Set emission.

The validation contract (VERDICT r2 item 7): write → independent-parser
read-back → cell-for-cell compare, plus the o2c driver hash gate vs the
DuckDB oracle. casacore itself is absent in this environment, so byte
parity with a real casacore build is explicitly out of scope
(sinks/casa_io.py docstring)."""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark.sinks import casa_tables, ms_file


def test_casa_table_roundtrip_all_dtypes(tmp_path):
    """Generic table writer/reader over every supported column kind:
    scalar + fixed-shape array of bool/int/float/double/complex/string,
    with scalar, float, and TpTable keywords."""
    rng = np.random.default_rng(7)
    nrow = 5
    cols = [
        {"name": "B", "dtype": "bool", "shape": None,
         "values": [True, False, True, True, False]},
        {"name": "I", "dtype": "int", "shape": None,
         "values": [-2, -1, 0, 1, 2]},
        {"name": "F", "dtype": "float", "shape": None,
         "values": [0.5, -1.25, 3.75, 0.0, 2.0]},
        {"name": "D", "dtype": "double", "shape": None,
         "values": [1.1, 2.2, -3.3, 4.4, 0.0]},
        {"name": "S", "dtype": "string", "shape": None,
         "values": ["a", "bb", "", "dddd", "e"]},
        {"name": "C", "dtype": "complex", "shape": None,
         "values": [complex(1, 2), complex(-1, 0), 0j,
                    complex(0.5, -0.5), complex(3, 3)]},
        {"name": "AD", "dtype": "double", "shape": (3,),
         "values": list(rng.normal(size=(nrow, 3)))},
        {"name": "AC", "dtype": "complex", "shape": (2, 4),
         "values": list((rng.normal(size=(nrow, 2, 4))
                         + 1j * rng.normal(size=(nrow, 2, 4))
                         ).astype(np.complex64))},
        {"name": "AB", "dtype": "bool", "shape": (2,),
         "values": list(rng.integers(0, 2, size=(nrow, 2)).astype(bool))},
        {"name": "AS", "dtype": "string", "shape": (2,),
         "values": [np.array(["x", "yy"], dtype=object)] * nrow},
    ]
    kw = {"MS_VERSION": ("float", 2.0), "NOTE": ("string", "hi"),
          "N": ("int", 42), "SUB": ("table", "SUBDIR")}
    casa_tables.write_table(str(tmp_path / "t"), "T", cols, nrow,
                            keywords=kw, info_type="Test",
                            readme="roundtrip")
    t = casa_tables.read_table(str(tmp_path / "t"))
    assert t["name"] == "T" and t["nrow"] == nrow
    assert t["keywords"]["N"] == ("int", 42)
    assert t["keywords"]["SUB"] == ("table", "SUBDIR")
    assert t["keywords"]["MS_VERSION"][1] == pytest.approx(2.0)
    c = t["columns"]
    assert c["B"].tolist() == [True, False, True, True, False]
    assert c["I"].tolist() == [-2, -1, 0, 1, 2]
    np.testing.assert_array_equal(
        c["F"], np.array([0.5, -1.25, 3.75, 0.0, 2.0], np.float32))
    np.testing.assert_array_equal(c["D"], [1.1, 2.2, -3.3, 4.4, 0.0])
    assert c["S"].tolist() == ["a", "bb", "", "dddd", "e"]
    np.testing.assert_array_equal(
        c["C"], np.array(cols[5]["values"], np.complex64))
    np.testing.assert_array_equal(c["AD"], np.stack(cols[6]["values"]))
    np.testing.assert_array_equal(c["AC"], np.stack(cols[7]["values"]))
    np.testing.assert_array_equal(c["AB"], np.stack(cols[8]["values"]))
    assert c["AS"][3].tolist() == ["x", "yy"]
    # table.info layout (TableInfo::flush)
    info = (tmp_path / "t" / "table.info").read_text()
    assert info.startswith("Type = Test\nSubType = \n\n")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    _dtypes = st.sampled_from(
        ["bool", "int", "float", "double", "complex", "string"])

    @st.composite
    def _table(draw):
        nrow = draw(st.integers(0, 6))
        ncol = draw(st.integers(1, 5))
        cols = []
        for i in range(ncol):
            dtype = draw(_dtypes)
            shape = draw(st.sampled_from([None, (2,), (3, 2)]))
            if dtype == "bool":
                elem = st.booleans()
            elif dtype == "int":
                elem = st.integers(-2**31, 2**31 - 1)
            elif dtype in ("float", "double"):
                elem = st.floats(allow_nan=False, width=32)
            elif dtype == "complex":
                elem = st.tuples(
                    st.floats(allow_nan=False, width=32),
                    st.floats(allow_nan=False, width=32)
                ).map(lambda t: complex(*t))
            else:
                elem = st.text(
                    alphabet=st.characters(codec="utf-8"), max_size=8)
            if shape is None:
                vals = [draw(elem) for _ in range(nrow)]
            else:
                n_el = int(np.prod(shape))
                base = {"bool": np.bool_, "int": np.int32,
                        "float": np.float32, "double": np.float64,
                        "complex": np.complex64}.get(dtype, object)
                vals = [np.array([draw(elem) for _ in range(n_el)],
                                 dtype=base).reshape(shape)
                        for _ in range(nrow)]
            cols.append({"name": f"C{i}", "dtype": dtype,
                         "shape": shape, "values": vals})
        return nrow, cols

    @settings(max_examples=25, deadline=None)
    @given(_table())
    def test_casa_table_roundtrip_property(tmp_path_factory, tb):
        """Property: ANY table of supported column kinds survives the
        write → independent-parse roundtrip value-for-value (the format
        description is self-consistent over the whole input space, not
        just the MS schema)."""
        nrow, cols = tb
        path = str(tmp_path_factory.mktemp("prop") / "t")
        casa_tables.write_table(path, "P", cols, nrow, info_type="Prop")
        t = casa_tables.read_table(path)
        assert t["nrow"] == nrow
        for col in cols:
            got = t["columns"][col["name"]]
            if col["shape"] is None:
                if col["dtype"] == "string":
                    assert list(got) == [str(v) for v in col["values"]]
                elif col["dtype"] in ("float",):
                    np.testing.assert_array_equal(
                        got, np.array(col["values"], np.float32))
                elif col["dtype"] == "complex":
                    np.testing.assert_array_equal(
                        got, np.array(col["values"], np.complex64))
                else:
                    assert list(got) == list(col["values"])
            else:
                want = (np.stack(col["values"]) if nrow else
                        np.zeros((0, *col["shape"])))
                if col["dtype"] == "string":
                    assert [c.tolist() for c in got] == \
                        [w.tolist() for w in want]
                else:
                    np.testing.assert_array_equal(got, want)


def test_casa_table_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "table.dat").write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        casa_tables.read_table(str(p))


@pytest.fixture(scope="module")
def ms_dir(spark, sf_dir, tmp_path_factory):
    from birli_spark import pipeline
    from birli_spark.sources import synthetic as syn

    out = str(tmp_path_factory.mktemp("o2c") / "obs.ms")
    baked = pipeline.preprocess_baked(spark, sf_dir)
    nrow = ms_file.write_ms_casa(
        spark, baked, out, pipeline.AVG_TIME, pipeline.AVG_FREQ,
        syn.GPS_START, syn.INT_TIME_S)
    return out, nrow


def test_ms_casa_tree_and_main_roundtrip(spark, sf_dir, ms_dir):
    """The written MS parses back: MAIN row count, subtable tree bound
    by TpTable keywords, MAIN values consistent with the o2 relation."""
    from birli_spark import pipeline
    from birli_spark.sinks import ms as ms_rel
    from birli_spark.sources import synthetic as syn

    out, nrow = ms_dir
    t = ms_file.read_ms_casa(out)
    assert set(t) == {"MAIN", "ANTENNA", "SPECTRAL_WINDOW",
                      "POLARIZATION", "DATA_DESCRIPTION", "FIELD",
                      "FEED", "STATE", "PROCESSOR", "OBSERVATION",
                      "HISTORY"}
    main = t["MAIN"]
    assert main["nrow"] == nrow
    # casacore Stokes enum for XX XY YX YY
    np.testing.assert_array_equal(
        t["POLARIZATION"]["columns"]["CORR_TYPE"][0], [9, 10, 11, 12])
    assert t["ANTENNA"]["columns"]["POSITION"].shape[1] == 3
    nchan_file = t["SPECTRAL_WINDOW"]["columns"]["CHAN_FREQ"].shape[1]

    # cell-for-cell vs the relational o2 surface (f32 where stored f32)
    rel = ms_rel.ms_main_rows(
        pipeline.preprocess_baked(spark, sf_dir), pipeline.AVG_TIME,
        pipeline.AVG_FREQ, syn.GPS_START, syn.INT_TIME_S).toPandas()
    rel = rel.sort_values(["time_block", "antenna1", "antenna2",
                           "chan"]).reset_index(drop=True)
    c = main["columns"]
    n_chan = c["DATA"].shape[1]
    assert n_chan == rel["chan"].nunique()
    # file rows are (block, ant1, ant2)-ordered; relation cells index
    # into (row, chan)
    row_key = {(int(tb), int(a1), int(a2)): i for i, (tb, a1, a2) in
               enumerate(zip(c["SCAN_NUMBER"] - 1, c["ANTENNA1"],
                             c["ANTENNA2"]))}
    ri = rel.apply(lambda r: row_key[(int(r.time_block),
                                      int(r.antenna1),
                                      int(r.antenna2))], axis=1)
    ch = rel["chan"].to_numpy()
    np.testing.assert_array_equal(
        c["DATA"][ri, ch, 0],
        (rel["data_xx_re"].to_numpy().astype(np.float32)
         + 1j * rel["data_xx_im"].to_numpy().astype(np.float32)))
    np.testing.assert_array_equal(
        c["WEIGHT_SPECTRUM"][ri, ch, 0],
        rel["weight"].to_numpy().astype(np.float32))
    np.testing.assert_array_equal(c["FLAG"][ri, ch, 0],
                                  rel["flag"].to_numpy())
    np.testing.assert_array_equal(c["TIME"][ri],
                                  rel["time_mjd_s"].to_numpy())
    np.testing.assert_array_equal(c["UVW"][ri, 0], rel["uvw_u"])
    assert nchan_file == n_chan


def test_ms_file_gate_matches_duckdb(spark, sf_dir):
    """The o2c driver-gate property: Spark read-back relation ==
    DuckDB oracle, value for value."""
    import duckdb

    import __spark_entry__ as entry

    sdf = entry.queries()["o2c_ms_file"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    ddf = con.execute(entry.oracle_sql()["o2c_ms_file"]).df()
    key = sorted(sdf.columns)
    assert key == sorted(ddf.columns)
    sdf = sdf.sort_values(key).reset_index(drop=True)
    ddf = ddf.sort_values(key).reset_index(drop=True)
    assert len(sdf) == len(ddf) > 0
    for col in key:
        assert (sdf[col].to_numpy() == ddf[col].to_numpy()).all(), col

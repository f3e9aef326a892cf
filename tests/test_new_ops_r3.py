"""Constructed-case semantics for the round-2 additions: H13 (TPC-H Q5
local-supplier volume), H14 (Q16 part-supplier counts), T23 (segment-
level exact dedup — the C4 boilerplate-removal recipe), and the S6
JSONL interchange roundtrip."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from birli_spark.operators import corpus_clean, relational


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


def test_local_supplier_volume_semantics(spark):
    region = spark.createDataFrame([
        Row(r_regionkey=0, r_name="ASIA"), Row(r_regionkey=1, r_name="X")])
    nation = spark.createDataFrame([
        Row(n_nationkey=0, n_name="JAPAN", n_regionkey=0),
        Row(n_nationkey=1, n_name="INDIA", n_regionkey=0),
        Row(n_nationkey=2, n_name="FRANCE", n_regionkey=1),
    ])
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s10", s_nationkey=0, s_acctbal=0.0),
        Row(s_suppkey=11, s_name="s11", s_nationkey=1, s_acctbal=0.0),
        Row(s_suppkey=12, s_name="s12", s_nationkey=2, s_acctbal=0.0),
    ])
    customer = spark.createDataFrame([
        Row(c_custkey=1, c_name="c1", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment="m"),
        Row(c_custkey=2, c_name="c2", c_nationkey=1, c_acctbal=0.0,
            c_mktsegment="m"),
    ])
    orders = spark.createDataFrame([
        # in-window, Japanese customer
        Row(o_orderkey=1, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1996, 6, 1), o_orderpriority="x"),
        # out-of-window
        Row(o_orderkey=2, o_custkey=1, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=_ts(1999, 6, 1), o_orderpriority="x"),
    ])
    lineitem = spark.createDataFrame([
        # supplier 10 (JAPAN) == customer nation -> counted under JAPAN
        Row(l_orderkey=1, l_suppkey=10, l_extendedprice=100.0,
            l_discount=0.10),
        # supplier 11 (INDIA) != customer nation (JAPAN) -> dropped
        Row(l_orderkey=1, l_suppkey=11, l_extendedprice=100.0,
            l_discount=0.0),
        # supplier 12 out of region -> dropped by the region prune
        Row(l_orderkey=1, l_suppkey=12, l_extendedprice=100.0,
            l_discount=0.0),
        # out-of-window order -> dropped
        Row(l_orderkey=2, l_suppkey=10, l_extendedprice=100.0,
            l_discount=0.0),
    ])
    out = relational.local_supplier_volume(
        customer, orders, lineitem, supplier, nation, region).collect()
    assert len(out) == 1
    assert out[0].n_name == "JAPAN"
    assert out[0].n_items == 1
    assert out[0].revenue == 90.0


def test_part_supplier_counts_semantics(spark):
    part = spark.createDataFrame([
        Row(p_partkey=1, p_name="a", p_brand="Brand#2", p_type="t1",
            p_size=5, p_retailprice=0.0),
        Row(p_partkey=2, p_name="b", p_brand="Brand#1", p_type="t1",
            p_size=5, p_retailprice=0.0),       # excluded brand
        Row(p_partkey=3, p_name="c", p_brand="Brand#3", p_type="t2",
            p_size=99, p_retailprice=0.0),      # size > max
    ])
    supplier = spark.createDataFrame([
        Row(s_suppkey=10, s_name="s", s_nationkey=0, s_acctbal=5.0),
        Row(s_suppkey=11, s_name="s", s_nationkey=0, s_acctbal=-1.0),  # bad
    ])
    lineitem = spark.createDataFrame([
        Row(l_orderkey=1, l_partkey=1, l_suppkey=10),
        Row(l_orderkey=2, l_partkey=1, l_suppkey=10),   # dup pair
        Row(l_orderkey=3, l_partkey=1, l_suppkey=11),   # denylisted supp
        Row(l_orderkey=4, l_partkey=2, l_suppkey=10),   # excluded brand
        Row(l_orderkey=5, l_partkey=3, l_suppkey=10),   # size > max
    ])
    out = relational.part_supplier_counts(part, lineitem, supplier).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.p_brand, r.p_type, r.p_size, r.supplier_cnt) == \
        ("Brand#2", "t1", 5, 1)


def test_segment_dedup_semantics(spark):
    # seg_len=2: doc 1 = [ab, cd, e]; doc 2 = [ab, xy]; doc 3 = [zz]
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e", lang="en", source="s", n_chars=9),
        Row(doc_id=2, text="a b x y", lang="en", source="s", n_chars=7),
        Row(doc_id=3, text="z z", lang="en", source="s", n_chars=3),
    ])
    out = {r.doc_id: r for r in corpus_clean.segment_dedup(
        docs, seg_len=2, min_docs=2).collect()}
    # "a b" appears in docs 1 and 2 -> boilerplate, dropped from both
    assert out[1].n_segs == 3 and out[1].n_kept == 2
    assert out[1].clean_n_tokens == 3          # "c d" + "e"
    assert out[2].n_segs == 2 and out[2].n_kept == 1
    assert out[2].clean_n_tokens == 2          # "x y"
    assert out[3].n_segs == 1 and out[3].n_kept == 1
    # md5 of the reassembled survivor text is order-correct
    import hashlib
    assert out[1].clean_md5 == hashlib.md5(b"c d e").hexdigest()
    assert out[2].clean_md5 == hashlib.md5(b"x y").hexdigest()


def test_segment_dedup_all_dropped(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b", lang="en", source="s", n_chars=3),
        Row(doc_id=2, text="a b", lang="en", source="s", n_chars=3),
    ])
    out = {r.doc_id: r for r in corpus_clean.segment_dedup(
        docs, seg_len=2, min_docs=2).collect()}
    import hashlib
    for d in (1, 2):
        assert out[d].n_kept == 0
        assert out[d].clean_n_tokens == 0
        assert out[d].clean_md5 == hashlib.md5(b"").hexdigest()


def test_jsonl_roundtrip(spark, tmp_path):
    from birli_spark.sources import jsonl
    docs = spark.createDataFrame([
        Row(doc_id=1, text='with "quotes" and \\ backslash', lang="en",
            source="s1", n_chars=29),
        Row(doc_id=2, text="unicode éü text", lang="de",
            source="s2", n_chars=15),
    ])
    out = {r.doc_id: r for r in jsonl.roundtrip_stats(
        spark, docs, str(tmp_path / "docs_jsonl")).collect()}
    import hashlib
    assert out[1].text_md5 == hashlib.md5(
        'with "quotes" and \\ backslash'.encode()).hexdigest()
    assert out[2].lang == "de" and out[2].n_chars == 15
    back = jsonl.read_documents_jsonl(
        spark, str(tmp_path / "docs_jsonl"))
    assert back.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,"
        "n_chars:int>")


def test_column_profile_semantics(spark):
    from birli_spark.operators import profile
    df = spark.createDataFrame(
        [Row(a=1, b=None, s="x"), Row(a=2, b=5.0, s="y"),
         Row(a=2, b=7.5, s=None)],
        "a int, b double, s string")
    out = {r.col_name: r for r in profile.column_profile(
        df, cols=(("a", True), ("b", True), ("s", False))).collect()}
    assert out["a"].n_nonnull == 3 and out["a"].n_distinct == 2
    assert out["a"].vmin == 1.0 and out["a"].vmax == 2.0
    assert out["a"].completeness_ppm == 1000000
    assert out["b"].n_nonnull == 2 and out["b"].vmax == 7.5
    assert out["b"].completeness_ppm == 666666
    assert out["s"].svmin == "x" and out["s"].svmax == "y"
    assert out["s"].vmin is None


def test_k_anonymity_semantics(spark):
    from birli_spark.operators import profile
    rows = [Row(c_custkey=i, c_name="c", c_nationkey=n, c_acctbal=0.0,
                c_mktsegment=m)
            for i, (n, m) in enumerate(
                [(0, "A")] * 5 + [(0, "B")] * 2 + [(1, "A")] * 1)]
    out = profile.k_anonymity(spark.createDataFrame(rows), k=5).collect()[0]
    assert out.n_groups == 3
    assert out.min_group_size == 1
    assert out.n_risky_groups == 2          # (0,B)=2 and (1,A)=1
    assert out.n_risky_rows == 3
    assert out.risky_row_ppm == 375000      # 3/8


def test_sequence_packing_semantics(spark):
    docs = spark.createDataFrame([
        # source s: doc 1 has 3 tokens (bin 0), doc 2 has 2 (starts at
        # cumsum 3 -> bin 0), doc 3 has 4 (starts at 5 -> bin 1)
        Row(doc_id=1, text="a b c", lang="en", source="s", n_chars=5),
        Row(doc_id=2, text="d e", lang="en", source="s", n_chars=3),
        Row(doc_id=3, text="f g h i", lang="en", source="s", n_chars=7),
        # another source packs independently
        Row(doc_id=4, text="x", lang="en", source="t", n_chars=1),
    ])
    out = {(r.source, r.bin): r for r in corpus_clean.sequence_packing(
        docs, seq_len=4).collect()}
    s0 = out[("s", 0)]
    assert s0.n_docs == 2 and s0.n_tokens == 5
    assert (s0.first_doc, s0.last_doc) == (1, 2)
    s1 = out[("s", 1)]
    assert s1.n_docs == 1 and s1.n_tokens == 4 and s1.first_doc == 3
    assert out[("t", 0)].n_docs == 1


def test_incremental_daily_agg_matches_full_recompute(spark):
    import datetime as dt

    from birli_spark.operators import merge
    base_day = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(Row(
            event_id=i, ts=base_day + dt.timedelta(hours=i * 13),
            user_id=i % 5, event_type="click" if i % 2 else "view",
            value=float(i), props="{}"))
    ev = spark.createDataFrame(rows).withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"])
        .expr("CAST(unix_micros(ts) AS BIGINT) * 1000"))
    cutoff_us = int(dt.datetime(2024, 1, 10).timestamp() * 1_000_000)
    out = merge.incremental_daily_agg(ev, cutoff_us=cutoff_us)
    # incremental merge must equal the from-scratch aggregate
    full = (ev.groupBy(
        __import__("pyspark.sql.functions", fromlist=["F"])
        .expr("CAST(FLOOR((ts div 1000) / 86400000000) * 86400 AS BIGINT)")
        .alias("day_epoch"), "event_type")
        .count())
    got = {(r.day_epoch, r.event_type): r.n_events for r in out.collect()}
    want = {(r.day_epoch, r.event_type): r["count"] for r in full.collect()}
    assert got == want
    # refreshed flags mark exactly the groups with delta rows
    refreshed = {(r.day_epoch, r.event_type)
                 for r in out.collect() if r.refreshed}
    assert refreshed  # some delta days exist
    assert all(d * 1_000_000 + 86_400_000_000 > cutoff_us
               for d, _ in refreshed)

"""Semantic tests for the CDC/merge operators: action accounting for
the upsert, interval integrity for the SCD2 history."""

from __future__ import annotations

from pyspark.sql import Row

from birli_spark.operators import merge
from birli_spark.sources import corpus


def test_upsert_action_accounting(spark, sf_dir):
    docs = corpus.load_documents(spark, sf_dir)
    out = merge.upsert_documents(docs).toPandas()
    n = docs.count()
    n_upd = docs.filter(f"doc_id % {merge.UPD_MOD} = 0").count()
    n_ins = docs.filter(f"doc_id % {merge.INS_MOD} = 0").count()
    by_action = out.groupby("action").size().to_dict()
    assert by_action["update"] == n_upd
    assert by_action["insert"] == n_ins
    assert by_action["keep"] == n - n_upd
    assert len(out) == n + n_ins
    assert out.doc_id.is_unique
    # inserted ids live above the offset; updates kept their id
    ins_ids = set(out[out.action == "insert"].doc_id)
    assert all(i >= merge.INS_OFFSET for i in ins_ids)


def test_scd2_intervals_partition_time(spark):
    ns = 1_000
    rows = [
        Row(event_id=1, ts=0 * ns, user_id=1, event_type="a",
            value=1.0, props="{}"),
        Row(event_id=2, ts=10 * ns, user_id=1, event_type="a",
            value=1.0, props="{}"),
        Row(event_id=3, ts=20 * ns, user_id=1, event_type="b",
            value=1.0, props="{}"),
        Row(event_id=4, ts=30 * ns, user_id=1, event_type="a",
            value=1.0, props="{}"),
    ]
    out = sorted(merge.scd2_user_type(
        spark.createDataFrame(rows)).collect(), key=lambda r: r.version)
    assert [(r.version, r.event_type, r.n_events) for r in out] == \
        [(1, "a", 2), (2, "b", 1), (3, "a", 1)]
    # intervals chain: valid_to of version k == valid_from of k+1;
    # the open tail has NULL valid_to
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert out[2].valid_to is None


def test_scd2_covers_all_events(spark, sf_dir):
    ev = corpus.load_events(spark, sf_dir)
    hist = merge.scd2_user_type(ev).toPandas()
    assert hist.n_events.sum() == ev.count()
    # exactly one open interval per user
    open_rows = hist[hist.valid_to.isna()]
    assert len(open_rows) == hist.user_id.nunique()


def test_snapshot_diff_semantics(spark):
    from birli_spark.operators.merge import (DEL_MOD, INS_MOD, UPD_MOD,
                                             snapshot_diff)
    # ids chosen to hit each action: 11→removed, 7→changed, 13→changed
    # base + added copy, others unchanged
    assert (DEL_MOD, UPD_MOD, INS_MOD) == (11, 7, 13)
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"text {i}", lang="en", source="s")
         for i in (1, 7, 11, 13)])
    out = {(r.source, r.action): r for r in snapshot_diff(docs).collect()}
    assert out[("s", "removed")].n_docs == 1          # doc 11
    assert out[("s", "changed")].n_docs == 1          # doc 7 (uppercased)
    assert out[("s", "added")].n_docs == 1            # doc 13+offset
    assert out[("s", "unchanged")].n_docs == 2        # docs 1, 13
    assert out[("s", "removed")].chars_delta == -len("text 11")
    assert out[("s", "added")].chars_delta == len("new text 13")
    assert out[("s", "changed")].chars_delta == 0


def test_compaction_plan_bins(spark):
    import datetime

    from pyspark.sql import Row

    from birli_spark.operators import merge
    # 3 days in one month with 3, 3, 2 rows; target 4 rows/bin ->
    # cumsum 3,6,8 -> bins floor((c-1)/4) = 0,1,1
    def ev(i, day):
        return Row(event_id=i,
                   ts=int(datetime.datetime(
                       2024, 3, day, 12, tzinfo=datetime.timezone.utc)
                       .timestamp() * 1e9),
                   user_id=1, event_type="t", value=0.0, props="{}")
    rows = ([ev(i, 1) for i in range(3)] + [ev(i + 10, 2) for i in range(3)]
            + [ev(i + 20, 3) for i in range(2)])
    out = merge.compaction_plan(spark.createDataFrame(rows),
                                target_rows=4).collect()
    by_bin = {r.bin: r for r in out}
    assert by_bin[0].n_files == 1 and by_bin[0].n_rows == 3
    assert by_bin[1].n_files == 2 and by_bin[1].n_rows == 5
    assert all(r.month == 202403 for r in out)

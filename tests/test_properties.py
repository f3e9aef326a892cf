"""Property-based tests (hypothesis) for the pure-numpy kernels: Van
Vleck inversions are true inverses on their domains, SumThreshold is
monotone and spike-complete, and the streaming session transition is
batch-split invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from birli_spark.operators import rfi, vanvleck
from birli_spark.streaming import sessions

US = 1_000_000
GAP = 1_800_000_000


# ------------------------------------------------------------- van vleck ---

@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=0.6, max_value=8.0))
def test_autos_inverts_sighat(sigma):
    got = vanvleck.van_vleck_autos(vanvleck.sighat(np.array([sigma])))
    assert abs(got[0] - sigma) < 1e-9


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=0.8, max_value=3.0),
       st.floats(min_value=0.8, max_value=3.0),
       st.floats(min_value=-0.8, max_value=0.8))
def test_crosses_inverts_forward_integral(s1, s2, rho):
    x = vanvleck._K[None, :] / s1
    y = vanvleck._K[None, :] / s2
    khat = vanvleck._corrcorrect_simp(
        np.array([abs(rho)]), *vanvleck._grids(x, y))[0][0]
    khat = np.copysign(khat, rho)
    got = vanvleck.van_vleck_crosses(
        np.array([khat]), np.array([s1]), np.array([s2]))
    assert abs(got[0] - rho * s1 * s2) < 1e-8


@settings(max_examples=20, deadline=None)
@given(st.floats(min_value=0.6, max_value=8.0))
def test_sighat_is_monotone_increasing(sigma):
    a, b = vanvleck.sighat(np.array([sigma, sigma + 0.1]))
    assert b > a


# ----------------------------------------------------------- sumthreshold ---

@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=15),
       st.integers(min_value=0, max_value=23),
       st.floats(min_value=50.0, max_value=1000.0))
def test_sumthreshold_flags_single_spike(ti, ci, amp):
    rng = np.random.default_rng(ti * 31 + ci)
    img = rng.normal(1.0, 0.1, size=(16, 24))
    img[ti, ci] += amp
    mask = rfi.sumthreshold_mask(img)
    assert mask[ti, ci]
    assert mask.mean() < 0.5  # no blanket flagging


@settings(max_examples=15, deadline=None)
@given(st.floats(min_value=3.0, max_value=8.0))
def test_sumthreshold_monotone_in_sensitivity(sens):
    rng = np.random.default_rng(7)
    img = rng.normal(1.0, 0.1, size=(16, 24))
    img[3, 4] += 50
    img[10, 12:16] += 5
    tight = rfi.sumthreshold_mask(img, base_sensitivity=sens)
    loose = rfi.sumthreshold_mask(img, base_sensitivity=sens + 2.0)
    assert (loose <= tight).all()  # higher threshold flags a subset


def test_sumthreshold_constant_image_unflagged():
    img = np.full((8, 8), 3.0)
    assert not rfi.sumthreshold_mask(img).any()


# ------------------------------------------------- session batch-splitting ---

events_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20_000),  # seconds
              st.floats(min_value=-10, max_value=10)),
    min_size=1, max_size=40)


@settings(max_examples=40, deadline=None)
@given(events_strategy, st.integers(min_value=0, max_value=39))
def test_session_transition_split_invariant(evs, cut):
    rows = [(t * US, i, v) for i, (t, v) in enumerate(sorted(evs))]
    pdf = pd.DataFrame(rows, columns=["ts_us", "event_id", "value"])
    whole, st_whole = sessions._session_update(1, pdf, None, GAP)
    cut = min(cut, len(pdf) - 1)
    if cut == 0:
        split, st_split = sessions._session_update(1, pdf, None, GAP)
    else:
        part1, mid = sessions._session_update(1, pdf.iloc[:cut], None, GAP)
        part2, st_split = sessions._session_update(1, pdf.iloc[cut:], mid, GAP)
        # part2 re-emits (upserts) any session it touched; final state of
        # each session_seq comes from the last emission
        merged = pd.concat([part1, part2]).drop_duplicates(
            subset=["session_seq"], keep="last").sort_values("session_seq",
                                                             ignore_index=True)
        split = merged
    assert st_whole == st_split
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), split.reset_index(drop=True),
        check_dtype=False)

# -- A1 averaging semantics: weighted mean of unflagged samples, plain-mean
#    fallback for all-flagged cells, weight = (signed) contributing sum --

avg_cells = st.lists(
    st.tuples(st.integers(0, 3),                       # t
              st.integers(0, 3),                       # chan
              st.floats(-50, 50, allow_nan=False),     # xx_re value
              st.floats(0.5, 4.0),                     # |weight|
              st.booleans()),                          # flagged
    min_size=1, max_size=24)


@settings(max_examples=12, deadline=None)
@given(avg_cells, st.integers(1, 3), st.integers(1, 3))
def test_averaging_matches_numpy(spark, cells, avg_t, avg_f):
    from pyspark.sql import Row
    from birli_spark.operators import averaging
    rows = [Row(t=t, chan=c, bl=0, ant1=0, ant2=1,
                xx_re=v, xx_im=0.0, xy_re=0.0, xy_im=0.0,
                yx_re=0.0, yx_im=0.0, yy_re=0.0, yy_im=0.0,
                weight=-w if fl else w, flag=fl)
            for t, c, v, w, fl in cells]
    out = {(r.t_out, r.chan_out): r
           for r in averaging.average_time_freq(
               spark.createDataFrame(rows), avg_t, avg_f).collect()}
    blocks = {}
    for t, c, v, w, fl in cells:
        blocks.setdefault((t // avg_t, c // avg_f), []).append((v, w, fl))
    assert set(out) == set(blocks)
    for key, samples in blocks.items():
        got = out[key]
        unflagged = [(v, w) for v, w, fl in samples if not fl]
        if unflagged:
            wsum = sum(w for _, w in unflagged)
            exp = sum(v * w for v, w in unflagged) / wsum
            assert not got.flag
            assert got.weight == pytest.approx(wsum, rel=1e-6)
        else:
            exp = sum(v for v, _, _ in samples) / len(samples)
            assert got.flag
            assert got.weight == pytest.approx(
                -sum(w for _, w, _ in samples), rel=1e-6)
        assert got.xx_re == pytest.approx(exp, rel=1e-5, abs=1e-5)
        assert got.n_samples == len(samples)


# -- shingle construction: count and content invariants --

@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from("ab cd ef gh ij kl".split()),
                min_size=0, max_size=12))
def test_shingle_count_invariant(spark, tokens):
    from birli_spark.operators import dedup
    from pyspark.sql import Row
    text = " ".join(tokens)
    docs = spark.createDataFrame([Row(doc_id=0, text=text)])
    got = sorted(r.s for r in dedup._shingle_table(docs).collect())
    n = dedup.SHINGLE_N
    exp = sorted({" ".join(tokens[i:i + n])
                  for i in range(max(0, len(tokens) - n + 1))})
    assert got == exp


# ------------------------------------------------- substring dedup (T26) ---

@settings(max_examples=10, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=30),
       st.integers(min_value=2, max_value=5))
def test_substring_dedup_span_invariants(spark, letters, window):
    """Spans never exceed the doc, never overlap (merged), and a doc
    paired with its exact copy is 100% duplicated."""
    from pyspark.sql import Row

    from birli_spark.operators import corpus_clean
    text = " ".join(letters)
    docs = spark.createDataFrame([
        Row(doc_id=1, text=text, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text=text, lang="en", source="s", n_chars=0)])
    out = {r.doc_id: r for r in
           corpus_clean.substring_dedup(docs, window=window).collect()}
    for r in out.values():
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert r.max_span <= r.dup_tokens
        if r.n_tokens >= window:
            # the whole doc is one duplicated run (exact copy exists)
            assert r.dup_tokens == r.n_tokens
            assert r.n_spans == 1
        else:
            assert r.dup_tokens == 0


# ------------------------------------------------------- theta sketch (SK7) ---

@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=8, max_value=64))
def test_theta_pairs_bounds(spark, sf_dir, k):
    from birli_spark.operators import sketches
    from birli_spark.sources import corpus
    docs = corpus.load_documents(spark, sf_dir).filter("doc_id < 60")
    out = sketches.theta_sketch_pairs(docs, k=k).toPandas()
    assert (out.n_inter <= out.n_union).all()
    assert (out.est_intersect <= out.est_union + 1e-9).all()
    assert ((out.est_jaccard >= 0) & (out.est_jaccard <= 1)).all()

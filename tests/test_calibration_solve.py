"""C7 — StEFCal DI gain solver (operators/calibration.solve_di_gains).

Semantic gates:
- exact recovery of known diagonal gains from a clean full-mesh system
  (up to the per-channel phase gauge, removed by ref-division);
- NaN data cells mask only their own equations; a chain with NO finite
  equations yields a NaN gain (the norfi.cal dump shape);
- repeated (pair, chan) rows act as extra least-squares equations, so a
  relational time-mean pre-reduction changes nothing;
- the distributed plan is ONE shuffle (the chan-block repartition for
  applyInPandas) over an input bounded by n_baselines x n_chans.
"""

from __future__ import annotations

import numpy as np
import pytest

from birli_spark.operators.calibration import (
    POLS, SOLVE_IN_COLS, _solve_channels, solve_di_gains)


def _mesh_rows(rng, n_ant, n_chan, gx, gy, nan_y=()):
    """Full-mesh rows [(chan, p, q, m4..., d4...)]; nan_y = set of
    (ant, chan) whose Y-row data cells are NaN'd."""
    rows = []
    for c in range(n_chan):
        for p in range(n_ant):
            for q in range(p + 1, n_ant):
                M = rng.normal(0, 1, (2, 2)) + 1j * rng.normal(0, 1, (2, 2))
                D = (np.diag([gx[c, p], gy[c, p]]) @ M
                     @ np.diag([gx[c, q], gy[c, q]]).conj().T)
                if (p, c) in nan_y:
                    D[1, 0] = D[1, 1] = np.nan
                if (q, c) in nan_y:
                    D[0, 1] = D[1, 1] = np.nan
                vals = [float(x) for z in M.reshape(-1)
                        for x in (z.real, z.imag)]
                vals += [float(x) for z in D.reshape(-1)
                         for x in (z.real, z.imag)]
                rows.append((c, p, q, *vals))
    return rows


@pytest.fixture(scope="module")
def truth():
    rng = np.random.default_rng(42)
    n_ant, n_chan = 5, 6
    gx = rng.normal(1, 0.3, (n_chan, n_ant)) + 1j * rng.normal(
        0, 0.3, (n_chan, n_ant))
    gy = rng.normal(1, 0.3, (n_chan, n_ant)) + 1j * rng.normal(
        0, 0.3, (n_chan, n_ant))
    return rng, n_ant, n_chan, gx, gy


def test_exact_recovery_spark(spark, truth):
    rng, n_ant, n_chan, gx, gy = truth
    rows = _mesh_rows(np.random.default_rng(1), n_ant, n_chan, gx, gy)
    pairs = spark.createDataFrame(
        rows, ["chan", "ant1", "ant2", *SOLVE_IN_COLS])
    sol = (solve_di_gains(pairs, n_ant=n_ant, normalize_ref=0,
                          iters=500, tol=1e-16)
           .toPandas().set_index(["chan", "ant"]).sort_index())
    assert len(sol) == n_chan * n_ant
    assert float(sol["rel_residual"].max()) < 1e-11
    for c in range(n_chan):
        tx = gx[c] / gx[c, 0]
        ty = gy[c] / gy[c, 0]
        for a in range(n_ant):
            r = sol.loc[(c, a)]
            assert abs(complex(r.gx_re, r.gx_im) - tx[a]) < 1e-9
            assert abs(complex(r.gy_re, r.gy_im) - ty[a]) < 1e-9


def test_nan_chain_and_masking():
    rng = np.random.default_rng(3)
    n_ant, n_chan = 5, 2
    gx = rng.normal(1, .3, (n_chan, n_ant)) + 1j * rng.normal(
        0, .3, (n_chan, n_ant))
    gy = rng.normal(1, .3, (n_chan, n_ant)) + 1j * rng.normal(
        0, .3, (n_chan, n_ant))
    # ant 3's whole Y chain NaN in chan 0 (the cotter norfi.cal shape)
    rows = _mesh_rows(np.random.default_rng(4), n_ant, n_chan, gx, gy,
                      nan_y={(3, 0)})
    chans = np.array([r[0] for r in rows])
    a1 = np.array([r[1] for r in rows])
    a2 = np.array([r[2] for r in rows])
    M = np.array([[complex(r[3], r[4]), complex(r[5], r[6]),
                   complex(r[7], r[8]), complex(r[9], r[10])]
                  for r in rows])
    D = np.array([[complex(r[11], r[12]), complex(r[13], r[14]),
                   complex(r[15], r[16]), complex(r[17], r[18])]
                  for r in rows])
    sx, sy, n_eq, rel = _solve_channels(chans, a1, a2, M, D, n_ant,
                                        200, 1e-15)
    assert np.isnan(sy[0, 3])                 # unconstrained chain
    assert not np.isnan(sx[0, 3])             # X chain still solved
    assert rel[0] < 1e-12 and rel[1] < 1e-12  # masked cells don't count
    # every other gain still exact (gauge-fixed by ref division)
    for c in range(n_chan):
        tx = gx[c] / gx[c, 0]
        err = np.abs(sx[c] / sx[c, 0] - tx)
        assert np.nanmax(err) < 1e-9


def test_repeated_rows_equal_time_mean():
    """k identical (pair, chan) rows solve to the same gains as one —
    the property that lets the caller pre-reduce a time axis with a
    relational mean before the shuffle."""
    rng = np.random.default_rng(5)
    n_ant, n_chan = 4, 2
    gx = rng.normal(1, .3, (n_chan, n_ant)) + 1j * rng.normal(
        0, .3, (n_chan, n_ant))
    gy = rng.normal(1, .3, (n_chan, n_ant)) + 1j * rng.normal(
        0, .3, (n_chan, n_ant))
    rows = _mesh_rows(np.random.default_rng(6), n_ant, n_chan, gx, gy)
    tripled = rows + rows + rows

    def solve(rs):
        chans = np.array([r[0] for r in rs])
        a1 = np.array([r[1] for r in rs])
        a2 = np.array([r[2] for r in rs])
        M = np.array([[complex(r[3], r[4]), complex(r[5], r[6]),
                       complex(r[7], r[8]), complex(r[9], r[10])]
                      for r in rs])
        D = np.array([[complex(r[11], r[12]), complex(r[13], r[14]),
                       complex(r[15], r[16]), complex(r[17], r[18])]
                      for r in rs])
        return _solve_channels(chans, a1, a2, M, D, n_ant, 200, 1e-15)

    sx1, sy1, _, _ = solve(rows)
    sx3, sy3, _, _ = solve(tripled)
    for c in range(n_chan):
        assert np.abs(sx1[c] / sx1[c, 0] - sx3[c] / sx3[c, 0]).max() < 1e-10
        assert np.abs(sy1[c] / sy1[c, 0] - sy3[c] / sy3[c, 0]).max() < 1e-10


def test_solver_plan_one_shuffle(spark, truth):
    """The physical plan: one Exchange (the groupBy(chan-block)
    hashpartitioning) feeding FlatMapGroupsInPandas — no sort-merge
    join, no extra shuffle."""
    rng, n_ant, n_chan, gx, gy = truth
    rows = _mesh_rows(np.random.default_rng(7), n_ant, n_chan, gx, gy)
    pairs = spark.createDataFrame(
        rows, ["chan", "ant1", "ant2", *SOLVE_IN_COLS])
    plan = (solve_di_gains(pairs, n_ant=n_ant)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_st14_stream_matches_batch_c7(spark):
    """The streaming accumulation's drained solve equals the batch
    solver's ticks exactly: the state carries the solve's sufficient
    statistics, so both paths converge to the same known-truth gains."""
    import __spark_entry__ as entry
    sf = "/root/testdata/sf0.001"
    qs = entry.queries()
    batch = {tuple(r)[:2]: tuple(r)[2:]
             for r in qs["c7_solve_di_gains"](spark, sf).collect()}
    stream = {tuple(r)[:2]: tuple(r)[2:]
              for r in qs["st14_stream_calsolve"](spark, sf).collect()}
    assert batch.keys() == stream.keys() and len(batch) > 0
    assert batch == stream


def test_mo7_labels_cover_catalogue(spark):
    """mo7 solves every (obs, cc) cell of the catalogue with the same
    per-label gains the oracle generates."""
    import __spark_entry__ as entry
    from birli_spark.operators import multiobs
    from birli_spark.sources import synthetic as syn
    sf = "/root/testdata/sf0.001"
    out = entry.queries()["mo7_multi_obs_calsolve"](spark, sf).toPandas()
    assert set(zip(out.obs_id, out.cc)) == {
        (o, c) for o in range(multiobs.N_OBS) for c in range(syn.NUM_CC)}
    assert out.ant.nunique() == syn.NUM_ANTS

"""ANN quality harness: measured recall@k of the approximate paths
(LSH, IVF, IVF-PQ+rerank) against the brute-force exact top-k on the
driver embeddings table. The scale paths trade exactness for pruning;
this records HOW MUCH, as a number the bench/verdict can cite.

Usage: python tools/ann_recall.py [sf_dir]   (default sf0.01)
Prints one JSON line: {"recall_at_k": {"lsh": r, "ivf": r, ...},
"k": 5, "n_queries": 8}.

``--lsh-grid``: instead measure the query-directed multiprobe LADDER
at production plane counts (8/12/16 planes x 8..64 probes) — the
committed evidence behind demoting lsh_topk to a teaching baseline.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from birli_spark.operators import similarity  # noqa: E402
from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import corpus  # noqa: E402


def topk_sets(df, key_q="qid", key_d="vec_id"):
    out: dict = {}
    for row in df.collect():
        out.setdefault(row[key_q], set()).add(row[key_d])
    return out


def recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, want in exact.items():
        got = approx.get(q, set())
        hits += len(got & want)
        total += len(want)
    return hits / max(total, 1)


def lsh_ladder_grid(sf_dir: str, n_queries: int = 8, k: int = 5,
                    plane_counts=(8, 12, 16),
                    probe_counts=(8, 16, 32, 48, 64)) -> dict:
    """``--lsh-grid``: measured recall@k of sign-bit LSH at PRODUCTION
    plane counts with a query-directed multiprobe LADDER (Lv et al.
    2007: probe buckets in increasing order of the summed |projection|
    of their flipped planes — the T most promising buckets per query).
    Pure-numpy simulation over the same frozen planes the operator
    uses — this is the committed evidence behind the round-7 decision
    to demote lsh_topk to a teaching baseline: on embeddings whose
    true top-k cosines sit near 0.3 (no angular concentration), the
    neighbor collision probability (1 - theta/pi)^planes collapses
    and NO (planes, probes) point reaches 0.8."""
    import heapq

    import duckdb
    import numpy as np

    from birli_spark.functions.lsh_planes import PLANES

    rows = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(V, axis=1)
    cos = (V[:n_queries] @ V.T) / np.outer(nrm[:n_queries], nrm)
    for i in range(n_queries):
        cos[i, np.where(ids == ids[i])[0]] = -2.0
    exact = {i: set(ids[np.argsort(-cos[i])[:k]])
             for i in range(n_queries)}
    P = np.array(PLANES, dtype=np.float64)
    grid = {}
    for m in plane_counts:
        proj = V @ P[:m].T
        bits = (proj >= 0).astype(np.int64)
        keys = bits @ (1 << np.arange(m, dtype=np.int64))
        for T in probe_counts:
            hits = 0
            for i in range(n_queries):
                order = np.argsort(np.abs(proj[i]))
                costs = np.abs(proj[i])[order]
                # T smallest-cost flip subsets (heap expansion)
                out, h, seen = [()], [(costs[0], (0,))], set()
                while len(out) < T and h:
                    c, sub = heapq.heappop(h)
                    if sub in seen:
                        continue
                    seen.add(sub)
                    out.append(sub)
                    last = sub[-1]
                    if last + 1 < m:
                        heapq.heappush(
                            h, (c - costs[last] + costs[last + 1],
                                sub[:-1] + (last + 1,)))
                        heapq.heappush(
                            h, (c + costs[last + 1], sub + (last + 1,)))
                cand: set = set()
                for sub in out[:T]:
                    kb = bits[i].copy()
                    for s in sub:
                        kb[order[s]] ^= 1
                    key = kb @ (1 << np.arange(m, dtype=np.int64))
                    cand |= set(ids[keys == key])
                cand -= {ids[i]}
                ranked = sorted(
                    cand, key=lambda v: -cos[i][np.where(ids == v)[0][0]])
                hits += len(set(ranked[:k]) & exact[i])
            grid[f"planes={m},probes={T}"] = round(
                hits / (n_queries * k), 4)
    return grid


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if "--lsh-grid" in sys.argv:
        grid = lsh_ladder_grid(sf_dir)
        print(json.dumps({"lsh_ladder_recall_at_5": grid,
                          "sf_dir": sf_dir}))
        return 0
    spark = get_spark("ann_recall")
    emb = corpus.load_embeddings(spark, sf_dir)
    exact = topk_sets(similarity.brute_topk(emb))
    results = {}
    for name, fn in (("lsh", similarity.lsh_topk),
                     ("ivf", similarity.ivf_topk),
                     ("ivfpq_rerank", similarity.ivfpq_topk)):
        results[name] = round(recall(topk_sets(fn(emb)), exact), 4)
    print(json.dumps({"recall_at_k": results, "k": 5, "n_queries": 8,
                      "sf_dir": sf_dir}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

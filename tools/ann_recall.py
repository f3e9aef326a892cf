"""ANN quality harness: measured recall@k of the approximate paths
(LSH, IVF, IVF-PQ+rerank) against the brute-force exact top-k on the
driver embeddings table. The scale paths trade exactness for pruning;
this records HOW MUCH, as a number the bench/verdict can cite.

Usage: python tools/ann_recall.py [sf_dir]   (default sf0.01)
Prints one JSON line: {"recall_at_k": {"lsh": r, "ivf": r, ...},
"k": 5, "n_queries": 8}.
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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

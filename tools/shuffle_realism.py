"""Shuffle-partition realism probe (round 6): the whole local test
surface runs at `spark.sql.shuffle.partitions == cores`; a real cluster
runs with partitions >> cores and relies on AQE coalescing/skew
splitting. This probe re-runs the skew-sensitive queries with
SPARK_GRAFT_SHUFFLE_PARTITIONS >> cores (subprocess, so the env reaches
a fresh session) and asserts:

1. every query still HASH-MATCHES its DuckDB oracle (results are
   partition-count independent), via tools/oracle_check.py;
2. the plan SHAPE is unchanged — broadcasts stay broadcasts, no
   sort-merge join appears just because the partition count grew
   (tools/plan_audit.py's audit function under the same env).

Writes SHUFFLE_REALISM_r6.json at the repo root.

Usage: python tools/shuffle_realism.py [sf_dir] [partitions]
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])

#: the queries whose shuffles are skew/partition-sensitive: the salted
#: skew aggregation, the banded LSH join with hot buckets, weighted
#: averaging, the windowed event agg, and the big relational join pair
QUERIES = [
    "e3_top_users_salted",
    "d3_minhash_lsh",
    "a1_average_time_freq",
    "e1_windowed_agg",
    "h5_shipping_priority",
    # round 6: the solver's chan-block applyInPandas shuffle must keep
    # its shape (and its oracle) under partitions >> cores + AQE
    "c7_solve_di_gains",
    "mo7_multi_obs_calsolve",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    parts = sys.argv[2] if len(sys.argv) > 2 else "512"
    inherited = os.environ.get("PYTHONPATH", "")
    env = {**os.environ,
           "SPARK_GRAFT_SHUFFLE_PARTITIONS": parts,
           # prepend, don't clobber (session.py's convention)
           "PYTHONPATH": f"{REPO}:{inherited}" if inherited else REPO}

    # 1) oracle pass under the cluster-like partition count
    res = subprocess.run(
        [sys.executable, f"{REPO}/tools/oracle_check.py", sf_dir,
         *QUERIES],
        env=env, capture_output=True, text=True, timeout=1800)
    tail = res.stdout.strip().splitlines()[-1] if res.stdout else ""
    m = re.search(r"== (\d+) pass, (\d+) fail", tail)
    n_pass = int(m.group(1)) if m else 0
    n_fail = int(m.group(2)) if m else -1

    # 2) plan audit under the same env: WARN count must be zero and no
    # sort-merge join may appear in these queries' plans
    audit = subprocess.run(
        [sys.executable, "-c", f"""
import sys, io, re
sys.path.insert(0, {REPO!r})
from contextlib import redirect_stdout
import __spark_entry__ as entrymod
from birli_spark.session import get_spark
import importlib.util
spec = importlib.util.spec_from_file_location(
    "plan_audit", {REPO!r} + "/tools/plan_audit.py")
pa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pa)
spark = get_spark("shuffle_realism")
assert spark.conf.get("spark.sql.shuffle.partitions") == {parts!r}, \\
    spark.conf.get("spark.sql.shuffle.partitions")
qs = entrymod.queries()
out = {{}}
for n in {QUERIES!r}:
    plan = pa.formatted_plan(qs[n](spark, {sf_dir!r}))
    notes = "; ".join(pa.audit(n, plan))
    out[n] = {{"notes": notes,
              "smj": len(re.findall("SortMergeJoin", plan)),
              "warn": "WARN" in notes}}
import json
print("AUDIT_JSON:" + json.dumps(out))
"""],
        env=env, capture_output=True, text=True, timeout=1800)
    audit_out = {}
    for line in audit.stdout.splitlines():
        if line.startswith("AUDIT_JSON:"):
            audit_out = json.loads(line[len("AUDIT_JSON:"):])

    artifact = {
        "method": ("oracle_check + plan audit re-run in a fresh session "
                   f"with spark.sql.shuffle.partitions={parts} (>> the "
                   "32 local cores) and AQE on — results and plan shape "
                   "must be partition-count independent"),
        "sf_dir": sf_dir,
        "shuffle_partitions": int(parts),
        "queries": QUERIES,
        "oracle": {"pass": n_pass, "fail": n_fail, "tail": tail},
        "plans": audit_out,
        "ok": (n_fail == 0 and n_pass == len(QUERIES)
               and bool(audit_out)
               and all(not v["warn"] and v["smj"] == 0
                       for v in audit_out.values())),
    }
    with open(f"{REPO}/SHUFFLE_REALISM_r6.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

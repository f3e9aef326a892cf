"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same configs (AQE, adaptive coalesce,
Arrow for pandas UDFs, UTC session timezone for oracle comparability) are
what we would set on a real cluster. `spark.sql.shuffle.partitions` is set
to the local core count — on a 1000-executor cluster this would be tuned to
~2-3x total cores or left to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "birli_spark", cpus: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session.

    Honors SPARK_GRAFT_CPUS for the bench harness; UTC timezone is pinned so
    timestamp outputs hash identically against the DuckDB oracle.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # make the package importable in executor Python workers regardless of
    # the driver's cwd (cluster deployments ship a wheel via --py-files;
    # local workers inherit PYTHONPATH from the JVM's environment)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pp}" if pp else repo_root)
    # tmpfs shuffle dirs suit the sf0.1 bench; a tens-of-GB run (the
    # scale-proof e2e) must spill to real disk instead of eating RAM —
    # SPARK_GRAFT_LOCAL_DIR overrides (set it to a /tmp path there)
    local_dir = os.environ.get(
        "SPARK_GRAFT_LOCAL_DIR",
        "/dev/shm" if os.path.isdir("/dev/shm") else None)
    # SPARK_GRAFT_SHUFFLE_PARTITIONS overrides the local default — the
    # shuffle-realism probe (tools/shuffle_realism.py) runs the oracle
    # suite with partitions >> cores + AQE to prove correctness and plan
    # shape are partition-count independent (a cluster reality check)
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS",
                                   str(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # local-mode shuffle tuning: spill/shuffle blocks to tmpfs and
        # skip compression — local shuffles are memory-to-memory copies,
        # so lz4 and disk latency are pure overhead at this scale. On a
        # real cluster leave spark.local.dir on fast local disks and
        # compression ON (network + disk bandwidth dominate there).
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        # the fused correction chain codegens a >8KB projection method;
        # without this flag HotSpot refuses to JIT it and the hot loop
        # runs interpreted (CodeGenerator logs "too long to be JIT
        # compiled"). On a cluster, set it in executor options too.
        .config("spark.driver.extraJavaOptions",
                "-Djava.io.tmpdir=/tmp -XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # caller overrides (e.g. the scale-proof e2e enables the REST UI
    # and shuffle compression) — applied last so they win
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_FINGERPRINT: str | None = None


def code_fingerprint() -> str:
    """Digest of the package source (+ the repo's __spark_entry__.py if
    present). Physical-fixture cache markers (s1j/s1k files, the e2e
    scan dir) embed it, so a code change invalidates the cache instead
    of certifying stale bytes written by an older checkout. Computed
    once per process (~1 MB of source)."""
    global _FINGERPRINT
    if _FINGERPRINT is not None:
        return _FINGERPRINT
    import hashlib
    pkg = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg)
    files = []
    for dirpath, dirnames, fnames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        files += [os.path.join(dirpath, f) for f in fnames
                  if f.endswith(".py")]
    entry = os.path.join(root, "__spark_entry__.py")
    if os.path.exists(entry):
        files.append(entry)
    h = hashlib.md5()
    for f in sorted(files):
        h.update(os.path.relpath(f, root).encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    _FINGERPRINT = h.hexdigest()
    return _FINGERPRINT


def marker_valid(marker_path: str) -> bool:
    """True iff the cache marker exists AND was written by THIS code
    version (see :func:`code_fingerprint`)."""
    try:
        with open(marker_path) as f:
            return f.read().strip() == code_fingerprint()
    except OSError:
        return False


def write_marker(marker_path: str) -> None:
    with open(marker_path, "w") as f:
        f.write(code_fingerprint())

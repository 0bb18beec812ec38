"""SparkSession factory tuned for the extraction workload.

Local-mode testing stands in for a multi-executor cluster; every conf here
is chosen to survive a 1000-executor / 100 TB scale-up:

- AQE on (runtime partition coalescing + skew-join splitting) — media-heavy
  documents make doc-level batches skewed (SURVEY.md §4.2).
- Arrow batches capped small: one row is a whole document whose `spans`
  array can hold thousands of elements, so the default 10k records/batch
  would build multi-GB Arrow buffers.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from the 2×cores initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _export_package_path() -> str:
    """Make this package importable on executor Python workers.

    Local mode workers inherit PYTHONPATH from the driver env; on a real
    cluster the equivalent is ``spark-submit --py-files`` of this package.
    """
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    # one BLAS/OMP thread per Python worker: N workers × M BLAS threads
    # oversubscribes the box catastrophically (3× slowdown at local[32]);
    # parallelism belongs to Spark tasks, not nested thread pools
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        os.environ.setdefault(var, "1")
    return pkg_root


def get_spark(
    app_name: str = "graphical-context-extraction",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    pkg_root = _export_package_path()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fat rows (whole document per row) → small Arrow batches
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.executorEnv.PYTHONPATH", pkg_root)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile — the
    runtime equivalent of ``spark-submit --py-files``, needed when the
    SparkSession was created by an external driver (so the PYTHONPATH
    export in get_spark never ran)."""
    if getattr(spark, "_gcep_pyfiles_added", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "gcep_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._gcep_pyfiles_added = True

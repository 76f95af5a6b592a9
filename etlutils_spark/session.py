"""SparkSession builder with engine defaults.

Defaults chosen for correctness-vs-oracle and scale:
- AQE on (runtime re-planning, skew-join handling, partition coalescing).
- Arrow on (vectorized pandas interchange for the mapInPandas surface).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Shuffle partitions sized for the local harness; on a real cluster this
  is expected to be overridden (or left to AQE coalescing, which makes
  the static number mostly a ceiling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # local mode = driver-only JVM: driver memory IS executor memory.
    # The 1g Spark default throttles any real workload (GC-locker stalls
    # at ~6M-row aggregations); 16g covers 10x the driver's bench scale.
    # Oversizing hurts too — a 48g heap measurably slowed sub-second
    # queries via GC ergonomics. Override with SPARK_GRAFT_MEM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "16g"),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_session(app_name: str = "etlutils_spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``extra_conf`` entries override the defaults. In local mode the
    master is ``local[$SPARK_GRAFT_CPUS]`` (default all cores); when a
    cluster master is already configured by the environment the builder
    leaves it alone.
    """
    # Python workers re-import this package to unpickle UDF closures
    # that reference module-level helpers; when the caller put the repo
    # on sys.path manually (instead of cwd/PYTHONPATH), workers would
    # fail with ModuleNotFoundError. Export the package root to them.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name)
    # respect an environment-configured master. spark-submit conveys it
    # via the spark.master conf/system property (which SparkConf's
    # loadDefaults reads), NOT the MASTER/SPARK_MASTER env vars — the
    # env-var-only check silently overrode `--master yarn` with local
    # mode, running a submitted cluster job single-node on the driver
    # (review catch)
    from pyspark import SparkConf

    env_master = (
        os.environ.get("MASTER")
        or os.environ.get("SPARK_MASTER")
        or SparkConf(loadDefaults=True).get("spark.master", None)
    )
    if not env_master:
        builder = builder.master(master)
    conf = {**DEFAULT_CONF, **extra_conf}
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def export_package_to_workers(spark: SparkSession) -> None:
    """Make ``etlutils_spark`` importable in this session's Python
    workers regardless of how the session was built.

    ``get_session`` handles its own sessions via PYTHONPATH, but a
    caller-built session (the grading driver, a notebook kernel, a real
    cluster) spawns workers that cannot unpickle closures referencing
    package modules (mapInPandas feature extraction, the Hilbert layout
    UDF) — ModuleNotFoundError at task time. Shipping the package as a
    zip via ``addPyFile`` works in every deployment mode, including a
    real cluster where workers share no filesystem with the driver.

    Idempotent per session; called from the query registry's table
    loader so every driver-contract query is safe in any session.
    """
    import tempfile
    import zipfile

    sc = spark.sparkContext
    marker = "_etlutils_spark_pkg_shipped"
    jsc = getattr(sc, marker, False)
    if jsc:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"etlutils_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "etlutils_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, marker, True)

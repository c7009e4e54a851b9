"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[N]``; the same config block is what a
``spark-submit --py-files`` cluster run would use (minus master/memory,
which come from the cluster manager). AQE is on so skewed cell joins get
runtime splitting on top of our explicit salting.
"""

from __future__ import annotations

import ctypes
import os

from pyspark.sql import SparkSession


def _tune_malloc() -> None:
    """Serve large allocations from the reused heap instead of fresh
    mmaps. glibc mmap()s big numpy/Arrow buffers and returns them to the
    OS on free, so every batch re-faults cold pages; on hosts with slow
    page provisioning (this sandbox measures first-touch as low as
    ~35 MB/s in bad phases, ~90× slower than reused pages) that
    dominates the kernels. Applies to this process via mallopt and to
    the JVM + forked Python workers via environment (glibc reads the
    _-suffixed vars at process start)."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, -1)       # M_TRIM_THRESHOLD: never give back
    except OSError:  # non-glibc platform — env vars still help children
        pass


_tune_malloc()


def session_token(spark: SparkSession) -> str:
    """Stable per-session cache key. ``id(spark)`` is unsafe — after a
    session is stopped and GC'd, a new SparkSession can reuse the same
    id and alias module-level caches to stale checkpoint handles and
    broadcasts from the dead session. applicationId + context startTime
    never recur."""
    sc = spark.sparkContext
    return f"{sc.applicationId}@{sc.startTime}"


def _external_master() -> bool:
    """True when a Spark master is already configured outside this
    factory. Under ``spark-submit`` the Python driver is launched by the
    JVM's PythonRunner (``PYSPARK_GATEWAY_PORT`` exported) and
    spark-submit always sets ``spark.master`` on the JVM side, so the
    builder must not override it. A plain ``python`` invocation has
    neither signal, so local[N] remains the default. If a gateway is
    already attached, the JVM conf is checked directly."""
    if os.environ.get("MASTER") or os.environ.get("PYSPARK_GATEWAY_PORT"):
        return True
    try:
        # stable import path (works on PySpark 3.x and 4.x; the
        # pyspark.core.context module is 4.x-only and a swallowed
        # ImportError would silently skip this check)
        from pyspark import SparkContext
        from pyspark.conf import SparkConf

        if SparkContext._jvm is not None:  # attached gateway: real conf
            return SparkConf(loadDefaults=True).contains("spark.master")
    except Exception:
        pass
    return False


def get_spark(
    app_name: str = "pdxbldgimport_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to the
    core count: on a real cluster this would instead be ~2-3× total cores
    (AQE coalesces down, so erring high is safe at 100 TB scale).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else os.cpu_count() or 4
    if shuffle_partitions is None:
        # override knob for topology experiments (e.g. local-cluster
        # legs want more, smaller reduce tasks than cores — on a real
        # cluster this would be ~2-3× total cores; AQE coalesces down)
        envp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(envp) if envp else max(cores, 8)

    builder = SparkSession.builder
    # Respect an externally-configured master (spark-submit --master /
    # spark.master property): only default to local[N] when none is set,
    # so the same entry point runs local in dev and distributed under a
    # cluster manager instead of silently overriding it with local mode.
    if not _external_master():
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Pin the heap: a growable 48g heap made G1 commit/uncommit tens of
        # GB across a run — observed as random multi-second stalls with the
        # CPUs idle. -Xms == -Xmx removes the churn.
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true -Xms"
            + os.environ.get("SPARK_DRIVER_MEM", "16g"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

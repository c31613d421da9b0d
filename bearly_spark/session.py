"""SparkSession factory + runtime-conf hygiene.

Scale posture: every config here is chosen for a 1000-executor cluster
reading ~100 TB; local test runs only shrink the shuffle-partition count
(via ``BEARLY_SHUFFLE_PARTITIONS``) because job-setup overhead dominates at
sub-GB scale (see BASELINE.md).

Key choices
-----------
- **AQE on** (coalesce + skew-join): at 100 TB the static shuffle partition
  count is always wrong somewhere; AQE re-plans at runtime.
- **Arrow on**: all driver<->python exchange is columnar.
- **ANSI off**: reference parity — bearly's sum wraps int64 on overflow
  (``bearly_ext.cc:69-74`` has no overflow checks); Spark's non-ANSI sum
  does the same.
- **nanosAsLong**: the events fixture stores parquet TIMESTAMP(NANOS),
  which Spark 4 refuses to read as a timestamp. We read raw int64 nanos and
  do time-bucket math on longs JVM-side (cheaper than timestamps anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and necessary) to set on an externally-owned
#: session at runtime — the driver harness calls our queries with its own
#: SparkSession, so every loader re-applies these defensively.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs our queries rely on. Idempotent."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be locked down on a managed cluster; queries that
            # need it will fail loudly there, which beats failing silently.
            pass
    return spark


def get_spark(
    app_name: str = "bearly-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (defaults to all
    cores); ``BEARLY_SHUFFLE_PARTITIONS`` the shuffle width (defaults to
    32, matching local[32] — on a real cluster you'd size this to
    ~2-3x total executor cores and let AQE coalesce).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("BEARLY_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # dims like nation/region/part are broadcast-size even at 100 TB
        # fact scale; raise the threshold so Catalyst picks BHJ for them.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("BEARLY_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return apply_runtime_confs(builder.getOrCreate())

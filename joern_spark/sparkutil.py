"""Shared helpers for the iterative-join loops (corpus BFS, connected
components): the small-regime playbook lives in ONE place.

`adaptive_paused` pauses AQE for the duration of a driver-side iterative
loop when the frames involved are known-small: AQE materializes each
shuffle stage with a driver round-trip to re-plan, which is pure
overhead once the driver has already sized every side (measured ~2x on
per-round latency at test scale).  Large regimes leave AQE on for
runtime coalescing and skew splitting.

LIMITATION (by design): `spark.conf` is session-global, so pausing AQE
is only safe while the session runs one query at a time — which is how
the bench, the driver and the batch jobs operate.  Concurrent queries in
a shared session should not call into these loops simultaneously; a
Spark-level fix would need per-query configuration, which Spark does not
offer for AQE.
"""

from __future__ import annotations

from contextlib import contextmanager

# Frames below this row count get broadcast hints inside iterative loops
# (and AQE paused); above it, shuffle joins + AQE.  One shared constant so
# the BFS and CC loops cannot drift apart.
BROADCAST_THRESHOLD = 100_000


_SPREAD_PROBE_MEMO: dict = {}


def spread(df, min_partitions: int | None = None, by: str | None = None):
    """Floor the partition count of a CPU-heavy stage's input at the
    cluster width (default: `sc.defaultParallelism`).

    Rationale (spark_optimization_guide §2/§6): parquet scan tasks are
    row-group-granular — a table written as one file with one row group
    yields ONE non-empty scan partition no matter how
    `maxPartitionBytes`/`minPartitionNum` split the byte ranges, so every
    downstream narrow stage (mapInPandas kernels, codegen projections)
    runs single-task and leaves the other cores idle.  The driver-side
    partition probe makes this SCALE-ADAPTIVE, not a local[32] constant:
    at real corpus scale the scan already has ≥ cores partitions and this
    is a no-op (no shuffle is ever added to an already-parallel input);
    locally it converts a few-MB exchange into a cores-wide stage.  Only
    call it on cheap-to-plan frames (scans/selects): the probe builds the
    physical plan once.

    `by` names a (unique-ish) key column to HASH-repartition on.  Prefer
    it: a keyless round-robin repartition first pays a LOCAL SORT of its
    input inside the (single) upstream task (sortBeforeRepartition, on by
    default since SPARK-23207 so retried tasks reproduce their row→
    partition assignment) — measured 3x on a 1M-row single-row-group
    scan; a deterministic hash key needs no such sort and is retry-safe
    by construction (guide §2.5).
    """
    if df.isStreaming:  # micro-batch partitioning is the stream's own affair
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        # memoize the probe per (session, analyzed-plan semantic hash):
        # df.rdd builds the full physical plan (~130 ms measured), and a
        # bench session re-plans the SAME scans dozens of times.  This
        # caches planning METADATA (a partition count), never data or
        # results; if the underlying files change under an identical plan
        # in a long-lived session, the worst case is a stale spread
        # decision (an unneeded or skipped repartition) — correctness is
        # unaffected either way.
        key = (id(spark._jsparkSession),
               df._jdf.queryExecution().analyzed().semanticHash())
        current = _SPREAD_PROBE_MEMO.get(key)
        if current is None:
            current = df.rdd.getNumPartitions()
            _SPREAD_PROBE_MEMO[key] = current
    except Exception:  # planning-probe failure must never break the query
        return df
    if current >= target:
        return df
    from pyspark.sql import functions as F
    return df.repartition(target, F.col(by)) if by else df.repartition(target)


@contextmanager
def adaptive_paused(spark, pause: bool, shuffle_partitions: int | None = None):
    """Temporarily disable AQE when `pause` (restoring the prior value,
    even on error).  No-op when `pause` is False.

    `shuffle_partitions`, when given and pausing, also lowers
    spark.sql.shuffle.partitions for the scope: with AQE off nothing
    coalesces post-shuffle, so a small-regime iterative loop otherwise
    pays the full default partition count in empty tasks per round
    (measured ~2x on the CC chain fixture at local[32])."""
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    before_sp = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        if pause:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            if shuffle_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions",
                               str(shuffle_partitions))
        yield before
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
        spark.conf.set("spark.sql.shuffle.partitions", before_sp)

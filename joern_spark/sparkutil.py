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

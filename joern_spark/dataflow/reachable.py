"""Corpus-level reachability as iterative DataFrame self-joins.

The scale path of the north_star: `reachable_pairs` computes which source
nodes reach which sink nodes along REACHING_DEF edges across the WHOLE
corpus at once — one distributed hash join per BFS iteration, co-keyed on
(url, node_id) so all traffic stays within a url's partition group.  The
iteration count is bounded by the longest DDG path in any document (small),
NOT by corpus size; each iteration is one shuffle.

`localCheckpoint` every few iterations cuts the growing lineage
(SURVEY.md §4 "iterative loops on Spark"); the visited-set subtraction
replaces the reference engine's memo table (Engine.scala:32-38).

This intentionally computes *reachability pairs* (source, sink), not
Joern-exact path enumerations — exact per-document flows come from the
in-UDF engine (joern_spark.dataflow.engine); tests assert the two agree on
reachable pairs for semantics-free edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachable_pairs(edges: DataFrame, sources: DataFrame, sinks: DataFrame,
                    max_iterations: int = 64) -> DataFrame:
    """BFS backwards from sinks over REACHING_DEF edges.

    edges:   (url, src, dst, label, variable)
    sources: (url, node_id)
    sinks:   (url, node_id)
    returns: (url, source_id, sink_id) pairs where source reaches sink.

    Every frontier is eagerly localCheckpoint-ed: the frontier is the SMALL
    set (≤ active chain tips, never the corpus), so materializing it per
    step costs one tiny job and buys (a) a free isEmpty check, (b) zero
    lineage growth — `visited` stays a plain union of already-materialized
    frontiers, so no iteration ever recomputes a prior join chain (the
    round-1 loop recomputed the whole window since the last checkpoint for
    BOTH the emptiness test and the next join).
    """
    rd = (edges.where(F.col("label") == "REACHING_DEF")
          .select("url", "src", "dst"))

    # distinct up front so the union-without-distinct invariant below holds
    # even if the caller's sinks frame carries duplicate (url, node_id) rows
    frontier = sinks.select("url", F.col("node_id").alias("cur"),
                            F.col("node_id").alias("sink_id")).distinct().persist()
    frontier.count()
    visited = frontier
    pinned = [frontier]  # every persisted frame; released before returning

    def expand(fr):
        return (
            fr.alias("f")
            .join(rd.alias("e"), on=[F.col("f.url") == F.col("e.url"),
                                     F.col("f.cur") == F.col("e.dst")])
            .select(F.col("f.url").alias("url"), F.col("e.src").alias("cur"), "sink_id")
        )

    for _i in range(max_iterations):
        # two hops per round: the per-round cost is dominated by fixed
        # job/stage scheduling, not data, so halving the round count
        # (ceil(depth/2) rounds) nearly halves wall time.  (Measured: 4
        # hops/round is SLOWER here — the deeper per-round join DAG costs
        # more than the rounds it saves; 2 is the sweet spot.)
        hop1 = expand(frontier)
        step = hop1.union(expand(hop1)).distinct()
        # left_anti dedups against everything seen; persist()+count()
        # materializes the frontier, so the emptiness check is free and no
        # later iteration recomputes a prior join chain.  (localCheckpoint
        # is the textbook tool here but Spark 4.1 fails to re-resolve
        # EXCEPT/anti-join plans over unions of checkpointed relations —
        # "key not found: url#N" — so materialized persist it is; frontiers
        # are chain-tip-sized, never corpus-sized.)
        new_frontier = step.join(visited, ["url", "cur", "sink_id"],
                                 "left_anti").persist()
        pinned.append(new_frontier)
        if new_frontier.count() == 0:
            break
        # new_frontier is disjoint from visited by construction (anti-join
        # above) — a plain union is exact; re-distincting the whole
        # accumulated set every step would re-shuffle it per iteration.
        visited = visited.union(new_frontier)
        frontier = new_frontier

    src = sources.select(F.col("url").alias("s_url"), F.col("node_id").alias("source_id"))
    result = (visited.join(src, on=[visited.url == src.s_url, visited.cur == src.source_id])
              .select("url", "source_id", "sink_id").distinct().persist())
    # Materialize the (pair-sized) result, then release every per-frontier
    # cache — otherwise repeated calls in a long-lived session accumulate
    # one cached block set per frontier per call (storage-memory creep).
    # The returned frame stays persisted (single small cache, caller-owned).
    result.count()
    for df in pinned:
        df.unpersist(blocking=False)
    return result

#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (full computation, no
driver collect).  Use SPARK_GRAFT_BENCH_QUERIES=a,b,c to subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from joern_spark.session import get_spark  # noqa: E402

DEFAULT_BENCH = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "events_tumbling",
    "events_sliding",
    "events_sessions",
    "events_top_users",
    "events_funnel",
    "events_user_totals_salted",
    "events_cube",
    "doc_token_counts",
    "doc_lang_id",
    "doc_quality",
    "doc_fingerprints",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_near_dup_pairs",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "dedup_clusters",
    "corpus_clean",   # composite filter→exact-dedup→near-dup-collapse pipeline
    "corpus_clean_shared",  # same, fed the precomputed cluster frame
    "corpus_stats",   # (lang, quality-decile) rollup
    "media_features",
    "customers_without_orders",
    "part_types_with_sales",
    "region_customer_counts",
    "cpg_build_flows",
    "cpg_node_stats",       # exercises the single-pass nodes+edges build
    "cpg_reachable_pairs",  # iterative-join reachability over REACHING_DEF
    "cpg_scan_throughput",  # flagship: sustained docs/sec over 4096 pages
    "cpg_web_taint",        # querydb-shape taint bundle over 1024 pages
    "cpg_cross_page_flows",  # site-level summarize-then-join flows, 512 pages
    "cpg_cross_page_flows_transitive",  # wrapper-chain closure, 256 pages
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    wanted = names.split(",") if names else DEFAULT_BENCH

    spark = get_spark(app_name="joern-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()

    # untimed warm-up: spin up ONE Arrow python worker per core (imports
    # dominate the first UDF stage; spark.python.worker.reuse then keeps
    # them; the metric of record is SUSTAINED docs/sec).  One partition per
    # core, else only a few workers warm and the first mapInPandas query
    # still pays ~5 s of cold imports.
    from joern_spark.query.scan import scan_findings
    from joern_spark.sources.corpus import make_pages
    par = spark.sparkContext.defaultParallelism
    scan_findings(make_pages(spark, n_docs=8 * par, n_partitions=par)) \
        .write.format("noop").mode("overwrite").save()
    # and the JVM SQL path (parquet vectorized reader + whole-stage codegen
    # compilation): the first parquet aggregate of a session otherwise pays
    # ~5 s of JIT/codegen that has nothing to do with the query under test
    (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
     .groupBy("l_returnflag").count()
     .write.format("noop").mode("overwrite").save())

    # K full-suite repetitions (default 3), per-query MINIMA + spread in
    # the emitted JSON: this host shows intermittent hypervisor steal that
    # can double a single-shot timing (same-code totals measured 19.4-32.2s
    # across windows in round 4).  Whole-suite sweeps separate a query's
    # repetitions in time, so a steal burst cannot poison every rep of one
    # query; the per-query minimum over sweeps is the honest sustained
    # number and the recorded spread lets any reader judge the noise
    # without cross-referencing prose.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    names_run = [n for n in wanted if n in qmap]
    samples: dict[str, list[float]] = {n: [] for n in names_run}
    rep_totals: list[float] = []
    for _ in range(reps):
        sweep = 0.0
        for name in names_run:
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            sweep += dt
            # some queries (dedup_clusters, corpus_clean) return their
            # result persisted and caller-owned — release between sweeps
            # (no-op for unpersisted frames, untimed either way)
            df.unpersist(blocking=False)
        rep_totals.append(round(sweep, 3))
    timings = {n: round(min(s), 3) for n, s in samples.items()}
    spread = {n: round(max(s) - min(s), 3) for n, s in samples.items()}

    total = round(sum(timings.values()), 3)
    # sustained docs/sec for the flagship CPG pipeline (north_star metric):
    # cpg_scan_throughput processes 4096 pages end-to-end (extract→CPG→scan)
    docs_per_sec = (
        round(4096.0 / timings["cpg_scan_throughput"], 2)
        if timings.get("cpg_scan_throughput") else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                # `value` composes each query's best sweep — an optimistic
                # composite, not an achievable single run; the fastest
                # MEASURED full sweep is min_rep_total below.
                "value_kind": "sum_of_query_minima",
                "unit": "sec",
                "queries": timings,
                "queries_spread": spread,
                "reps": reps,
                "rep_totals": rep_totals,
                "min_rep_total": round(min(rep_totals), 3),
                "cpg_docs_per_sec": docs_per_sec,
                "sf": sf,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            }
        )
    )


if __name__ == "__main__":
    main()

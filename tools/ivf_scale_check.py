#!/usr/bin/env python
"""IVF scale check: run the Lloyd-trained IVF-flat ANN path at sf1 with a
√N-sized codebook (K=64, n_probe=8 by default — the oracle-gated driver
query runs K=16/probe-4) and record recall@5 vs the exact baseline plus
wall time, so the chunked assign kernel's memory bound and the trained
codebook have scale evidence beyond K=16.

Usage: python tools/ivf_scale_check.py [--sf-dir /tmp/sf1] [--k-cells 64]
           [--n-probe 8] [--out docs/IVF_sf1_K64_r7.json]
Prints one JSON line and writes it to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--k-cells", type=int, default=64)
    ap.add_argument("--n-probe", type=int, default=8)
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out",
                    default=os.path.join(REPO, "docs", "IVF_sf1_K64_r7.json"))
    args = ap.parse_args()

    from joern_spark.pipeline.similarity import (
        ann_topk_ivf, cosine_topk, train_ivf_codebook,
    )
    from joern_spark.session import get_spark

    spark = get_spark(app_name="ivf-scale-check")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_corpus = emb.count()  # also warms the JVM parquet path
    queries = emb.where(emb.vec_id < args.n_queries)

    # warm the Arrow workers untimed (round-1 gotcha: first mapInPandas
    # pays seconds of Python-worker startup per core)
    ann_topk_ivf(emb, queries, k=args.k, n_centroids=args.k_cells,
                 n_probe=args.n_probe).count()

    t0 = time.perf_counter()
    approx = {(r.query_id, r.nbr_id)
              for r in ann_topk_ivf(emb, queries, k=args.k,
                                    n_centroids=args.k_cells,
                                    n_probe=args.n_probe).collect()}
    ivf_wall = time.perf_counter() - t0

    # the index-build seam: codebook trained ONCE, then each query batch
    # pays only assign + probe + exact-on-candidates
    t0 = time.perf_counter()
    cb = train_ivf_codebook(emb, n_centroids=args.k_cells, n_iters=2)
    train_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    shared = {(r.query_id, r.nbr_id)
              for r in ann_topk_ivf(emb, queries, k=args.k,
                                    n_probe=args.n_probe,
                                    codebook=cb).collect()}
    shared_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    exact = {(r.query_id, r.nbr_id)
             for r in cosine_topk(emb, queries, k=args.k).collect()}
    brute_wall = time.perf_counter() - t0

    assert shared == approx, "pretrained-codebook path diverged"
    recall = len(exact & approx) / len(exact)
    out = {
        "metric": "ivf_recall_at_k_scaled",
        "sf_dir": args.sf_dir,
        "n_corpus": n_corpus,
        "n_queries": args.n_queries,
        "k": args.k,
        "n_centroids": args.k_cells,
        "n_probe": args.n_probe,
        "recall": round(recall, 4),
        "ivf_wall_sec": round(ivf_wall, 2),
        "train_once_wall_sec": round(train_wall, 2),
        "shared_codebook_wall_sec": round(shared_wall, 2),
        "brute_wall_sec": round(brute_wall, 2),
    }
    line = json.dumps(out)
    with open(args.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 testdata (10x → "sf1").

The graded testdata tops out at sf0.1; the round-4 plan calls for running
the full bench + oracle-parity at 10x to observe the documented plan
transitions (AQE joins, candidate-set growth) at scale.  This tool
replicates every sf0.1 table R times with key offsets that preserve
referential integrity:

- region/nation: fixed dimensions, copied once.
- customer/supplier/part/orders/lineitem: primary keys offset by
  replica*stride (stride = max(key)+1); foreign keys offset by the SAME
  stride so every join resolves inside its replica, exactly like the
  original — the join selectivities and group cardinalities per replica
  are unchanged, only the table sizes grow 10x.
- events: event_id/user_id offset (user population grows 10x; per-user
  session/window structure identical).
- documents: doc_id offset; replica r>0 texts get a deterministic ` r<r>`
  suffix (n_chars adjusted) so near-dup structure grows instead of
  degenerating into 10-way exact-duplicate cliques with rank ties.
- embeddings: vec_id offset (stride divisible by 10 keeps the
  `vec_id % 10` pruning distribution); replica r>0 vectors get a
  deterministic float32 nudge on dimension 0 to break exact distance
  ties in top-k queries.

Everything is derived from the sf0.1 parquet alone — no external data,
no randomness.  Usage:  python tools/gen_scale.py [out_dir] [replicas]
(defaults /tmp/sf1, 10).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(out_dir: str = "/tmp/sf1", replicas: int = 10):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def stride(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key})+1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

    sc = stride("customer", "c_custkey")
    ss = stride("supplier", "s_suppkey")
    sp = stride("part", "p_partkey")
    so = stride("orders", "o_orderkey")
    se = stride("events", "event_id")
    su = stride("events", "user_id")
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")

    def copy(table: str):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
                    f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)")

    def replicate(table: str, select_for_r):
        parts = " UNION ALL ".join(select_for_r(r) for r in range(replicas))
        con.execute(f"COPY ({parts}) TO '{out_dir}/{table}.parquet' "
                    f"(FORMAT PARQUET)")

    copy("region")
    copy("nation")
    replicate("customer", lambda r: f"""
        SELECT c_custkey + {r * sc} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""")
    replicate("supplier", lambda r: f"""
        SELECT s_suppkey + {r * ss} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{SRC}/supplier.parquet'""")
    replicate("part", lambda r: f"""
        SELECT p_partkey + {r * sp} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet'""")
    replicate("orders", lambda r: f"""
        SELECT o_orderkey + {r * so} AS o_orderkey,
               o_custkey + {r * sc} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""")
    replicate("lineitem", lambda r: f"""
        SELECT l_orderkey + {r * so} AS l_orderkey,
               l_partkey + {r * sp} AS l_partkey,
               l_suppkey + {r * ss} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""")
    replicate("events", lambda r: f"""
        SELECT event_id + {r * se} AS event_id, ts,
               user_id + {r * su} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")
    replicate("documents", lambda r: f"""
        SELECT doc_id + {r * sd} AS doc_id,
               text || '{'' if r == 0 else f' r{r}'}' AS text,
               lang, source,
               n_chars + {0 if r == 0 else len(f' r{r}')} AS n_chars
        FROM '{SRC}/documents.parquet'""")

    # embeddings via pyarrow: float32 nudge on dim 0 per replica
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    vid = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy()
    out_ids, out_vecs, out_labs = [], [], []
    for r in range(replicas):
        v = vec.copy()
        v[:, 0] = (v[:, 0] + np.float32(r) * np.float32(0.001)).astype(np.float32)
        out_ids.append(vid + r * sv)
        out_vecs.append(v)
        out_labs.append(lab)
    all_vecs = np.concatenate(out_vecs)
    tab = pa.table({
        "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
        "embedding": pa.array(list(all_vecs), type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(out_labs), type=pa.int32()),
    })
    pq.write_table(tab, f"{out_dir}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)

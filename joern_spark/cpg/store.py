"""CPG table persistence — the `cpg.bin` / importCpg equivalent
(reference: CpgBasedTool.scala:8-15, DefaultOverlays.scala:11).

The store is two parquet table trees (nodes/, edges/) range-partitioned by
(domain_bucket) — the parquet stand-in for Iceberg `bucket(url)` partition
spec — so downstream per-url joins (CPGQL frames, reachability) can prune
to the buckets they touch.

Idempotency: node ids are content-derived, so mode="overwrite" over the
same pages is byte-stable.  Parquet mode="append" physically DUPLICATES
rows on re-save (no merge in plain parquet); `load_cpg_tables` therefore
dedups on the content keys by default, which restores logical idempotency
for append-mode re-saves (the MERGE the Iceberg sink would do natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_cpg_tables(nodes: DataFrame, edges: DataFrame, out_dir: str,
                    n_domain_buckets: int = 64, mode: str = "overwrite"):
    def bucketed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "domain_bucket", F.abs(F.hash("url")) % n_domain_buckets)

    (bucketed(nodes).repartition("domain_bucket")
     .write.mode(mode).partitionBy("domain_bucket").parquet(f"{out_dir}/nodes"))
    (bucketed(edges).repartition("domain_bucket")
     .write.mode(mode).partitionBy("domain_bucket").parquet(f"{out_dir}/edges"))


def load_cpg_tables(spark: SparkSession, out_dir: str,
                    dedup: bool = True) -> tuple[DataFrame, DataFrame]:
    """importCpg: load the persisted graph; partition pruning on
    domain_bucket comes free from the directory layout.

    dedup=True drops physical duplicates left by append-mode re-saves
    (content-derived ids make the row sets identical, so dropDuplicates on
    the content keys is an exact merge); pass dedup=False to skip the
    shuffle when the store was written with mode="overwrite".
    """
    nodes = spark.read.parquet(f"{out_dir}/nodes").drop("domain_bucket")
    edges = spark.read.parquet(f"{out_dir}/edges").drop("domain_bucket")
    if dedup:
        nodes = nodes.dropDuplicates(["url", "node_id"])
        edges = edges.dropDuplicates(["url", "src", "dst", "label", "variable"])
    return nodes, edges

"""Bag-of-nodes / bag-of-API-symbols method embeddings
(the joern-vectors equivalent — reference joern-cli JoernVectors.scala:16-49).

Spark form: one groupBy over the nodes table — `(url, method, token) →
count`, or pivoted into a sparse map per method.  Tokens are node labels
(structure view) or callee names (API-symbol view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_method(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    contains = edges.where(F.col("label") == "CONTAINS").select(
        "url", F.col("src").alias("method_id"), F.col("dst").alias("node_id"))
    return contains.join(nodes, ["url", "node_id"])


def bag_of_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(url, method_id, token=node label, n)."""
    m = _with_method(nodes, edges)
    return (m.groupBy("url", "method_id", F.col("label").alias("token"))
            .agg(F.count(F.lit(1)).alias("n")))


def bag_of_api_symbols(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(url, method_id, token=callee name, n) over non-operator calls."""
    m = _with_method(nodes, edges).where(
        (F.col("label") == "CALL") & ~F.col("name").startswith("<operator>"))
    return (m.groupBy("url", "method_id", F.col("name").alias("token"))
            .agg(F.count(F.lit(1)).alias("n")))


def method_vectors(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Sparse map per method: (url, method_id, vector map<token,count>)."""
    bag = bag_of_nodes(nodes, edges)
    return (bag.groupBy("url", "method_id")
            .agg(F.map_from_entries(F.collect_list(F.struct("token", "n")))
                 .alias("vector")))

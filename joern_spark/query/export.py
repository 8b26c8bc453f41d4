"""Graph export (the joern-export equivalent, SURVEY.md §2D).

Reference: joern-cli JoernExport.scala:34-134 — representations
Ast/Cfg/Ddg/Cdg/Pdg/All exported as dot/graphml/neo4j-csv.  Spark form:
the representation is a filter on the edges table; formats are writers:
- csv:  nodes/edges parquet→csv directories (neo4j-admin import shape)
- json: JSON lines per document
- dot:  per-document DOT text assembled in one Arrow pass
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPRESENTATIONS = {
    "ast": ["AST"],
    "cfg": ["CFG"],
    "ddg": ["REACHING_DEF"],
    "cdg": ["CDG"],
    "pdg": ["REACHING_DEF", "CDG"],
    "cpg14": ["AST", "CFG", "REACHING_DEF", "CDG"],
    "all": None,  # every edge label
}


def edges_for(edges: DataFrame, representation: str) -> DataFrame:
    labels = REPRESENTATIONS[representation]
    return edges if labels is None else edges.where(F.col("label").isin(labels))


def export_csv(nodes: DataFrame, edges: DataFrame, representation: str, out_dir: str):
    """neo4j-csv style: one nodes dir + one relationships dir."""
    nodes.write.mode("overwrite").option("header", True).csv(f"{out_dir}/nodes")
    (edges_for(edges, representation)
     .write.mode("overwrite").option("header", True).csv(f"{out_dir}/edges"))


def export_json(nodes: DataFrame, edges: DataFrame, representation: str, out_dir: str):
    nodes.write.mode("overwrite").json(f"{out_dir}/nodes")
    edges_for(edges, representation).write.mode("overwrite").json(f"{out_dir}/edges")


def export_dot(nodes: DataFrame, edges: DataFrame, representation: str) -> DataFrame:
    """One DOT digraph per document: (url, dot)."""
    e = edges_for(edges, representation)
    lines = e.select(
        "url",
        F.concat(F.lit('  "'), F.col("src"), F.lit('" -> "'), F.col("dst"),
                 F.lit('" [label="'), F.col("label"), F.lit('"];')).alias("line"),
    )
    return (lines.groupBy("url")
            .agg(F.concat_ws("\n", F.collect_list("line")).alias("body"))
            .select("url", F.concat(F.lit("digraph g {\n"), F.col("body"),
                                    F.lit("\n}")).alias("dot")))

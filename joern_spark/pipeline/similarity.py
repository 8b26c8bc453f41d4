"""Similarity search over `embeddings(vec_id, embedding: array<float>, label)`.

- `cosine_topk`      : brute-force cosine top-k — the exactness baseline.
                       Dot products via JVM-side `aggregate`/`zip_with` on
                       double-cast arrays (no Python), top-k via window
                       row_number partitioned by query id.
- `random_hyperplane_buckets` + `ann_topk_lsh` : the scale path — sign-LSH
                       (random hyperplanes, seeded deterministic) buckets
                       vectors; candidate set = same-bucket vectors only,
                       then exact cosine within bucket.  At 100 TB the
                       brute-force cross join is O(N·Q); the LSH variant
                       shards the join on bucket id (uniform) so each
                       executor sees only its bucket's candidates.

Scale notes: the query side is broadcast (queries ≪ corpus); the corpus
side never shuffles for brute force (map-side cross with broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(a: str, b: str):
    """Cosine between two array<double> columns, float64 accumulation,
    rounded to 6 dp for engine portability."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.round(dot / (na * nb), 6)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: every query vs every corpus vector.

    `queries` is expected to be small → broadcast, so the cross join is
    map-side (no shuffle of the corpus).  Ties break on neighbor id for
    determinism.
    """
    c = corpus.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    scored = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("nbr_id"))
    scored = scored.select("query_id", "nbr_id", _cos("q_emb", "c_emb").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def random_hyperplane_buckets(df: DataFrame, n_planes: int = 8, seed: int = 42, dim: int = 64) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p = sign(dot(v, plane_p)).

    Planes are a deterministic pseudo-random ±1 pattern derived from
    (seed, plane, dim-index) via a pure arithmetic hash — identical in any
    engine, no RNG state.  Output: (vec_id, bucket string of n_planes bits).
    """
    emb = F.col("embedding").cast("array<double>")
    bit_exprs = []
    for p in range(n_planes):
        # ±1 pattern: sign = 1 if ((i*2654435761 + (seed+p)*40503) mod 97) < 48
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, i: v
                * F.when(((i * 2654435761 + (seed + p) * 40503) % 97) < 48, F.lit(1.0)).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit_exprs.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select("vec_id", "embedding", F.concat(*bit_exprs).alias("bucket"))


def _multi_table_buckets(df: DataFrame, n_tables: int, n_planes: int, dim: int = 64) -> DataFrame:
    """(vec_id, embedding, table, bucket): L independent hash tables of k
    planes each (standard LSH construction — recall grows with L)."""
    out = None
    for t in range(n_tables):
        b = random_hyperplane_buckets(df, n_planes, seed=42 + 1000 * t, dim=dim) \
            .withColumn("table", F.lit(t))
        out = b if out is None else out.unionByName(b)
    return out


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 n_planes: int = 6, n_tables: int = 8) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: candidates = union over
    L tables of same-bucket vectors, then exact cosine on candidates only.

    The join key (table, bucket) is near-uniform; AQE splits any skewed
    buckets.  Recall grows with n_tables (the scale lever); exactness
    baseline is `cosine_topk` (recall measured in tests).
    """
    c = _multi_table_buckets(corpus, n_tables, n_planes).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
        "table", "bucket",
    )
    q = _multi_table_buckets(queries, n_tables, n_planes).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
        "table", "bucket",
    )
    cand = (c.join(F.broadcast(q), ["table", "bucket"])
            .where(F.col("query_id") != F.col("nbr_id"))
            .select("query_id", "nbr_id", "q_emb", "c_emb")
            .dropDuplicates(["query_id", "nbr_id"]))
    scored = cand.select("query_id", "nbr_id", _cos("q_emb", "c_emb").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine")
    )


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95, n_planes: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact verify.

    Pairs are emitted once (a < b).  Bucketing bounds the pair blow-up to
    within-bucket; at 10^12 scale n_planes grows with log(N).
    """
    b = random_hyperplane_buckets(corpus, n_planes).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "bucket"
    )
    a = b.alias("a")
    c = b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("c.vec_id").alias("vec_b"),
        _cos("a.emb", "c.emb").alias("cosine"),
    )
    return pairs.where(F.col("cosine") >= threshold)

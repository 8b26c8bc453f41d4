"""Deduplication operators over `documents`:

- exact dedup        : hash-groupBy on md5(text) — one shuffle, map-side
                       partial aggregation for free.
- MinHash signatures : shingle → 16 seeded md5 minima, all JVM-side
                       (`transform` over a seed array + `array_min`), no
                       Python and no shuffle.
- LSH candidates     : band the signature (4 bands × 4 rows), hash each
                       band, self-join on (band_idx, band_hash).  At scale
                       the join key space is uniform md5 output → no skew;
                       band table is `explode`d so the shuffle carries
                       (doc_id, band) pairs only, never the text.
- SimHash            : 64-bit sign-of-weighted-bits over token hashes,
                       computed via explode + groupBy(bit) — two narrow
                       shuffles of integer rows.
- n-gram Jaccard     : exact verification on LSH candidate pairs only
                       (never all-pairs).
- embedding near-dup : cosine > threshold on LSH-candidate or brute pairs
                       (see similarity.py).

Everything uses lexicographic-min over md5 hex strings as the hash order,
which is engine-portable (identical in DuckDB for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE = 3


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) → (hash, survivor doc_id, count).

    Map-side combine makes this a single narrow shuffle of (hash, id) pairs.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("survivor_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# (a column-level `shingles()` helper used to live here; it re-tokenized
# the text once per array element — a per-row O(k·n) trap.  Use `shingled`,
# which stages tokenization as its own projection.)


def shingled(df: DataFrame, text_col: str = "text", k: int = SHINGLE) -> DataFrame:
    """(doc_id, sh array<string>) with tokenization staged so each step is
    computed once per row: text → toks → shingles."""
    t = df.select("doc_id", F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
                  F.trim(F.col(text_col)).alias("_t"))
    make = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - F.lit(k), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("toks"), (i + j + 1).cast("int")) for j in range(k)]),
    )
    return t.select(
        "doc_id",
        F.when(F.size("toks") >= k, make).otherwise(F.array(F.substring("_t", 1, 1000))).alias("sh"),
    )


MINHASH_PRIME = 2147483647  # 2^31-1; double-hashing modulus


def minhash_signature(df: DataFrame, text_col: str = "text", n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash via double hashing: ONE md5 per shingle, then
    sig[i] = min over shingles of (h1 + i*h2) mod p, where h1/h2 are the
    two 60-bit halves of the digest (the standard Kirsch-Mitzenmacher
    construction).  16× fewer digests than seeded-md5 minhash; all
    arithmetic is engine-portable (DuckDB oracle computes the identical
    function).  Entirely columnar, no shuffle.
    """
    sh_df = shingled(df, text_col)
    hs = sh_df.select(
        "doc_id",
        F.transform(F.col("sh"), lambda x: F.md5(x)).alias("hs"),
    )
    pair = hs.select(
        "doc_id",
        F.transform(
            F.col("hs"),
            lambda h: F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % MINHASH_PRIME,
        ).alias("h1"),
        F.transform(
            F.col("hs"),
            lambda h: F.conv(F.substring(h, 16, 15), 16, 10).cast("long")
            % (MINHASH_PRIME - 1) + 1,
        ).alias("h2"),
    )
    seeds = F.array(*[F.lit(s) for s in range(n_hashes)])
    sig = F.transform(
        seeds,
        lambda s: F.array_min(
            F.zip_with("h1", "h2", lambda a, b: (a + s.cast("long") * b) % MINHASH_PRIME)
        ),
    )
    return pair.select("doc_id", sig.alias("minhash"))


def lsh_candidate_pairs(
    sig_df: DataFrame, n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """LSH banding: band_hash = md5(concat of the band's minhashes); docs
    colliding in any band become a candidate pair.

    The self-join is on (band_idx, band_hash): md5 keys are uniform, so the
    shuffle is skew-free by construction; each side carries only
    (doc_id, band_idx, band_hash).
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.element_at("minhash", b * rows_per_band + r + 1) for r in range(rows_per_band)],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig_df.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )
    # materialize before the self-join: both join sides would otherwise
    # recompute the full minhash lineage (signature = the expensive part)
    banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (LSH output), via distinct
    shingle sets.  Join order: pairs (small) broadcast against docs."""
    docs = shingled(df, text_col).select("doc_id", F.array_distinct("sh").alias("sh"))
    j = (
        pairs.join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return j.select(
        "doc_a",
        "doc_b",
        (inter / union).alias("jaccard"),
    )


def simhash(df: DataFrame, text_col: str = "text", n_bits: int = 64) -> DataFrame:
    """64-bit SimHash as a bit-string column (portable: avoids signed-int64
    overflow differences across engines).

    Per distinct token: md5 hex → 16 nibbles → 64 bits; count-weighted vote
    per bit (+cnt if set, −cnt if not), sign → bit.  Two narrow shuffles of
    integer rows: groupBy(doc, token-hash) then groupBy(doc, bit); the final
    assembly sorts bits inside one groupBy(doc).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # (doc_id, h, cnt): weight = token frequency; hash once per distinct token.
    t = (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", F.md5("tok").alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Explode to (doc_id, bit, vote).  nibble = position of hex char;
    # bit value = (nibble >> (3 - bit%4)) & 1, MSB-first within the nibble,
    # done with div/mod so the same SQL runs in DuckDB for the oracle.
    bits = t.select(
        "doc_id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bt"),
    ).select(
        "doc_id",
        "bt",
        F.expr(
            "CASE WHEN CAST(FLOOR((instr('0123456789abcdef',"
            " substring(h, CAST(FLOOR(bt/4) AS INT)+1, 1)) - 1)"
            " / CAST(POW(2, 3 - bt % 4) AS INT)) AS INT) % 2 = 1"
            " THEN cnt ELSE -cnt END"
        ).alias("vote"),
    )
    per_bit = bits.groupBy("doc_id", "bt").agg(
        F.when(F.sum("vote") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bitval")
    )
    return per_bit.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("bt", "bitval"))),
                lambda s: s["bitval"],
            ),
        ).alias("simhash_bits")
    )

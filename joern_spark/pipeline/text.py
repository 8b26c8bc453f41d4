"""Text analysis operators (language-ID heuristic, quality scoring, token
counting, document fingerprinting) over a `documents(doc_id, text, lang,
source, n_chars)` table.

Design notes (100 TB scale):
- All operators are pure column expressions → whole-stage codegen, no
  shuffles except the final aggregations the caller asks for.
- No Python UDFs anywhere: `split`/`transform`/`aggregate`/`md5` run
  JVM-side and vectorized.
- Every computed column is aliased so results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from joern_spark.sparkutil import spread

# Tiny embedded stopword lists for the language-ID heuristic.  The point is
# the *operator shape* (set-membership scoring over tokens, pure SQL), not
# linguistic accuracy.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "es"]
DE_STOPWORDS = ["der", "die", "das", "und", "zu", "ist", "ein", "nicht"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe. JVM-side `split`."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4), the common 4-chars-per-token heuristic)."""
    toks = tokens(F.col(text_col))
    return spread(df, by="doc_id").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_text"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("n_subword_est"),
    )


def _count_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def _stop_hit_count(toks: Column) -> Column:
    """Occurrence count of EN stopwords in `toks`.

    Deliberately the interpreted `filter(toks, isin)` lambda, NOT a chain
    of codegen'd array_remove calls (r8 experiment): the 8-deep
    array_remove tree executed 7x faster (0.47 s vs 3.5 s per-row cost at
    sf1) but its generated class is large enough that the 38-query bench
    suite evicts it from the codegen cache
    (spark.sql.codegen.cache.maxEntries=100) every sweep, re-paying a
    ~3 s Janino compile per execution — measured 3.5 s/sweep steady vs
    0.6 s for the compile-free interpreted form.  In a dedicated pipeline
    (few distinct plans, warm codegen cache) array_remove wins; in a
    many-query session the lambda does."""
    return F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))


def pred_lang_col(text_col: str = "text") -> Column:
    """The lang_id prediction as a single reusable Column (same formula
    as `lang_id` — composite pipelines fold it into one projection
    instead of paying a doc_id join against the lang_id frame)."""
    toks = tokens(F.col(text_col))
    en = _count_hits(toks, EN_STOPWORDS)
    es = _count_hits(toks, ES_STOPWORDS)
    de = _count_hits(toks, DE_STOPWORDS)
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-heuristic language ID.

    Scores each language by distinct-stopword hits; ties break by fixed
    priority (en > es > de > unknown) so results are deterministic and
    SQL-expressible for the oracle.
    """
    toks = tokens(F.col(text_col))
    en = _count_hits(toks, EN_STOPWORDS)
    es = _count_hits(toks, ES_STOPWORDS)
    de = _count_hits(toks, DE_STOPWORDS)
    return spread(df, by="doc_id").select(
        "doc_id",
        en.alias("en_hits"),
        es.alias("es_hits"),
        de.alias("de_hits"),
        # one formula per metric: the prediction column IS pred_lang_col
        pred_lang_col(text_col).alias("pred_lang"),
    )


def quality_micro_col(text_col: str = "text") -> Column:
    """The quality score (integer micro-units) as a single reusable
    Column — identical formula to `quality_score`'s quality_micro."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = _stop_hit_count(toks)
    return F.floor(
        F.when(n_tok < 5, F.lit(0.0)).otherwise(
            F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (F.lit(1.0) - stop_hits / n_tok)
        )
        * 1e6
    ).cast("long")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality scoring: length, mean token length, stopword ratio,
    alpha ratio — the usual web-corpus filters (C4/Gopher style), as pure
    column arithmetic.  Ratios rounded to 6 decimals for cross-engine
    comparability.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = _stop_hit_count(toks)
    # Integer micro-units (floor(x*1e6)): identical IEEE double arithmetic in
    # any engine, no rounding-mode ambiguity for the oracle compare.
    mean_tok_len = F.floor((n_chars - (n_tok - F.lit(1))) / n_tok * 1e6).cast("long")
    stop_ratio = F.floor(stop_hits / n_tok * 1e6).cast("long")
    # one formula per metric: the composite score column IS quality_micro_col
    score = quality_micro_col(text_col)
    return spread(df, by="doc_id").select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_text"),
        mean_tok_len.alias("mean_token_len_micro"),
        stop_ratio.alias("stopword_ratio_micro"),
        score.alias("quality_micro"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: exact content hash + an order-insensitive
    bag-of-words fingerprint (md5 over the sorted distinct token set)."""
    toks = tokens(F.col(text_col))
    return spread(df, by="doc_id").select(
        "doc_id",
        F.md5(F.col(text_col)).alias("content_hash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("bow_fingerprint"),
    )

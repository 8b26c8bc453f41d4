"""Regression tests for the round-4 ADVICE items (fixed in round 5):

- cos_pandas_udf: null/ragged/zero-norm rows degrade to null, not a
  failed Arrow batch (similarity.py)
- Semantics._memo is bounded on the process-global instance
  (semantics.py)

(crosspage repeated-call and PNG bomb guard live in test_crosspage.py /
test_multimodal.py next to their suites.)"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cos_udf_degrades_bad_rows_to_null(spark):
    from joern_spark.pipeline.similarity import cos_pandas_udf

    rows = [
        (0, [1.0, 0.0], [1.0, 0.0]),    # good → 1.0
        (1, None, [1.0, 0.0]),          # null array → null
        (2, [1.0], [1.0, 0.0]),         # ragged → null
        (3, [0.0, 0.0], [1.0, 0.0]),    # zero norm → null
        (4, [0.0, 2.0], [0.0, 1.0]),    # good → 1.0
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>")
    cos = cos_pandas_udf()
    got = {r.id: r.c for r in
           df.select("id", cos(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[0] == 1.0 and got[4] == 1.0
    assert got[1] is None and got[2] is None and got[3] is None


def test_cos_udf_null_element_is_null_not_failure(spark):
    from joern_spark.pipeline.similarity import cos_pandas_udf

    df = spark.createDataFrame(
        [(0, [1.0, None], [1.0, 0.0]), (1, [3.0, 4.0], [3.0, 4.0])],
        "id long, a array<double>, b array<double>")
    cos = cos_pandas_udf()
    got = {r.id: r.c for r in
           df.select("id", cos(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[0] is None
    assert got[1] == 1.0


def test_semantics_memo_is_bounded():
    from joern_spark.cpg.semantics import Semantics, operator_flows

    s = Semantics(operator_flows())
    s._memo_cap = 8
    for i in range(100):
        s.for_method_full_name(f"never.seen.before.{i}")
    assert len(s._memo) <= 8
    # lookups still correct after resets
    assert s.for_method_full_name("never.seen.before.1") is None

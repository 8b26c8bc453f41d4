"""joern_spark — a from-scratch PySpark-native code-property-graph (CPG)
analytics engine with the query capabilities of joernio/joern, re-expressed
Spark-first (DataFrame/SQL + Arrow-vectorized pandas UDFs + Structured
Streaming) over Common-Crawl-style web-page tables
``(url, warc_ts, html, text, lang)``.

Layout
------
- ``session``    : SparkSession factory tuned for the engine.
- ``sources``    : deterministic synthetic corpus generator (FIXTURES.md §1).
- ``extract``    : byte-offset-preserving <script>/EJS extraction
                   (parity with reference EjsPreprocessor.scala:19-96).
- ``frontends.js``: pure-Python ES-subset parser (replaces the reference's
                   Babel `astgen` subprocess, AstGenRunner.scala:240-300).
- ``cpg``        : AST→CPG lowering, CFG, dominators/CDG, reaching-defs/DDG.
- ``dataflow``   : reachableBy engine (exact per-document + iterative
                   DataFrame-join corpus-level variant).
- ``query``      : CPGQL-style DataFrame step DSL + scan job.
- ``streaming``  : micro-batch pipeline, windows/watermarks, exactly-once sink.
- ``pipeline``   : web-scale training-data ops (dedup, similarity, text
                   quality, multimodal plumbing).
"""

__version__ = "0.1.0"

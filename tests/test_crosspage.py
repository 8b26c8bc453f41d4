"""Cross-document (site-level) flow tests — query/crosspage.py.

The per-page summaries reuse the reference-parity engine (reachableBy);
the cross-page composition is this engine's site-level extension: a
library page's tainted return + an app page's eval-feeding call of the
same function on the same domain."""

from __future__ import annotations

from joern_spark.query.crosspage import cross_page_flows, summarize_page
from joern_spark.sources.corpus import make_site_pages


LIB = ("<html><body><script>function getParam() "
       "{ var p = location.search; return p; }\n"
       "function helper(x) { return x; }\n</script></body></html>")
APP = "<html><body><script>var p = getParam(); eval(p);\n</script></body></html>"
APP_CLEAN = "<html><body><script>var q = helper('x'); eval(q);\n</script></body></html>"
APP_LOG = "<html><body><script>var r = getParam(); log(r);\n</script></body></html>"


def _flags(url, html):
    return {(k, n): t for (_d, _u, k, n, t) in summarize_page(url, html)}


def test_summarize_lib_page():
    f = _flags("https://a.example.com/lib", LIB)
    assert f[("def", "getParam")] is True      # returns location.search
    assert f[("def", "helper")] is False       # returns its own argument


def test_summarize_app_pages():
    assert _flags("https://a.example.com/app", APP)[("call", "getParam")] is True
    assert _flags("https://a.example.com/c", APP_CLEAN)[("call", "helper")] is True
    # result only logged -> not an eval flow
    assert _flags("https://a.example.com/l", APP_LOG)[("call", "getParam")] is False


def test_summarize_repeated_call_any_tainted():
    """Multiple calls of the same name: the summary must be tainted if ANY
    of them feeds eval, not just the first (`log(r)` first, `eval(p)`
    second)."""
    html = ("<html><body><script>var r = getParam(); log(r);\n"
            "var p = getParam(); eval(p);\n</script></body></html>")
    f = _flags("https://a.example.com/multi", html)
    assert f[("call", "getParam")] is True
    # and exactly one summary row per name, not one per call site
    rows = summarize_page("https://a.example.com/multi", html)
    names = [n for (_d, _u, k, n, _t) in rows if k == "call"]
    assert names.count("getParam") == 1


def test_cross_page_flows_join(spark):
    """512-page site corpus: only getParam produces cross-page flows
    (getConfig's definition is clean; helper's definition is clean), and
    every domain's count is the def-pages x call-pages product."""
    rows = cross_page_flows(make_site_pages(spark, n_docs=512)).collect()
    assert rows, "expected cross-page flows"
    assert {r.func_name for r in rows} == {"getParam"}
    for r in rows:
        assert r.n_cross_flows == r.n_source_pages * r.n_sink_pages
        assert r.n_source_pages > 0 and r.n_sink_pages > 0


def test_same_page_does_not_self_flow():
    """A page that defines AND calls its own function emits no call row
    for it — the flow must genuinely cross documents."""
    html = ("<html><body><script>function getParam() "
            "{ var p = location.search; return p; }\n"
            "var x = getParam(); eval(x);\n</script></body></html>")
    keys = {(k, n) for (_d, _u, k, n, _t)
            in summarize_page("https://a.example.com/self", html)}
    assert ("def", "getParam") in keys
    assert ("call", "getParam") not in keys


def test_summarize_wrap_rows():
    """Wrap rows: a wrapper whose return depends on an unresolved call's
    result is tainted=True; one that drops the value is tainted=False."""
    from joern_spark.query.crosspage import summarize_page_ext

    keeps = ("<html><body><script>function buildUrl() "
             "{ var b = getParam(); var u = 'x' + b; return u; }\n"
             "</script></body></html>")
    drops = ("<html><body><script>function ignoreIt() "
             "{ var x = getParam(); var y = 'safe'; return y; }\n"
             "</script></body></html>")
    rows = {(k, n, c): t for (_d, _u, k, n, c, t)
            in summarize_page_ext("https://a.example.com/w", keeps)}
    assert rows[("wrap", "buildUrl", "getParam")] is True
    rows = {(k, n, c): t for (_d, _u, k, n, c, t)
            in summarize_page_ext("https://a.example.com/x", drops)}
    assert rows[("wrap", "ignoreIt", "getParam")] is False


def test_cross_page_flows_transitive_chain(spark):
    """Chain corpus (full residue coverage on big domains): taint closes
    getParam -> buildUrl -> navTo across pages; the clean chain (getConfig
    -> confUrl) and the taint-dropping wrapper (ignoreIt) do NOT flow."""
    from joern_spark.query.crosspage import cross_page_flows_transitive
    from joern_spark.sources.corpus import make_chain_pages

    rows = cross_page_flows_transitive(make_chain_pages(spark, n_docs=256)) \
        .collect()
    assert rows, "expected transitive flows"
    by_domain = {}
    for r in rows:
        by_domain.setdefault(r.domain, set()).add(
            (r.origin_func, r.called_func))
    # every flow originates at getParam; confUrl/ignoreIt never appear
    for pairs in by_domain.values():
        assert {o for o, _c in pairs} == {"getParam"}
        assert not {c for _o, c in pairs} & {"confUrl", "ignoreIt"}
    # a domain with full coverage shows the 3-page chain tip (navTo)
    full = {c for pairs in by_domain.values() for _o, c in pairs}
    assert "navTo" in full and "buildUrl" in full and "getParam" in full


def test_embedding_near_dups_lsh_bucketed(spark):
    """pipeline/similarity.embedding_near_dups: the LSH-bucketed scale
    path finds the same pairs as a brute-force threshold scan on a small
    corpus where bucketing cannot miss (copies land in the same bucket)."""
    import numpy as np
    from pyspark.sql import functions as F

    from joern_spark.pipeline.similarity import embedding_near_dups

    rng = np.random.RandomState(11)
    base = rng.randn(8, 64).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        # exact copy under a new id → cosine 1.0, same LSH bucket
        rows.append((i * 2 + 1, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b)
           for r in embedding_near_dups(df, threshold=0.999).collect()}
    assert got == {(i * 2, i * 2 + 1) for i in range(8)}


def test_failed_pages_counted_not_silent(spark):
    """A page whose summarization throws (RecursionError on pathological
    nesting — a real crawl-corpus failure mode) emits a counted
    kind='error' row instead of vanishing; valid pages on the same
    partition are unaffected, and no flow query ever matches the error
    row (tainted=False)."""
    from joern_spark.query.crosspage import (
        page_flow_summaries, page_flow_summaries_ext, summary_error_counts,
    )

    bomb = "<script>" + "(" * 8000 + "</script>"
    pages = spark.createDataFrame(
        [("https://a.example.com/lib", LIB),
         ("https://a.example.com/bomb", bomb)],
        "url string, html string")
    for mk in (page_flow_summaries, page_flow_summaries_ext):
        rows = mk(pages).collect()
        errs = [r for r in rows if r.kind == "error"]
        assert len(errs) == 1
        assert errs[0].url.endswith("/bomb")
        assert errs[0].func_name == "summarize_failed:RecursionError"
        assert errs[0].tainted is False
        # valid page still summarized
        assert any(r.kind == "def" and r.func_name == "getParam"
                   for r in rows)
    counts = {r.error_class: r.n_pages
              for r in summary_error_counts(
                  page_flow_summaries_ext(pages)).collect()}
    assert counts == {"summarize_failed:RecursionError": 1}


def test_wrap_cap_skips_and_counts():
    """Past max_wrap_pairs the remaining wrap-edge dataflow tests are
    SKIPPED and counted — a capped page loses wrap edges but never
    invents them."""
    from joern_spark.query.crosspage import summarize_page_ext

    html = ("<html><body><script>"
            "function w1() { return f1(); }\n"
            "function w2() { return f2(); }\n"
            "function w3() { return f3(); }\n"
            "</script></body></html>")
    st: dict = {}
    rows = summarize_page_ext("https://a.example.com/w", html,
                              max_wrap_pairs=2, _stats=st)
    wraps = [r for r in rows if r[2] == "wrap"]
    assert len(wraps) == 2
    assert st == {"wrap_pairs": 2, "wrap_skipped": 1}
    # uncapped: all three wrap edges, none skipped
    st2: dict = {}
    rows2 = summarize_page_ext("https://a.example.com/w", html, _stats=st2)
    assert len([r for r in rows2 if r[2] == "wrap"]) == 3
    assert st2 == {"wrap_pairs": 3, "wrap_skipped": 0}

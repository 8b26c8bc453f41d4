"""Property-based robustness: random ES programs from a small grammar must
build CPGs that satisfy structural invariants (no crashes, orders assigned,
CFG anchored, DDG edges between CFG nodes).  Complements the golden suites
(which pin exact values) with breadth."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from joern_spark.cpg.build import build_cpg
from joern_spark.cpg.core import CFG_NODE_LABELS

NAMES = st.sampled_from(["a", "b", "c", "x", "y", "foo", "bar", "sz"])
NUMS = st.sampled_from(["0", "1", "42", "0x37", "3.14"])


def expr(depth):
    if depth <= 0:
        return st.one_of(NAMES, NUMS, st.sampled_from(['"s"', "true", "null"]))
    sub = expr(depth - 1)
    return st.one_of(
        NAMES, NUMS,
        st.tuples(sub, st.sampled_from(["+", "-", "*", "==", "&&", "||", "<"]), sub)
        .map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(NAMES, st.lists(sub, max_size=3))
        .map(lambda t: f"{t[0]}({', '.join(t[1])})"),
        st.tuples(NAMES, NAMES).map(lambda t: f"{t[0]}.{t[1]}"),
        st.tuples(sub, sub, sub).map(lambda t: f"({t[0]} ? {t[1]} : {t[2]})"),
        st.lists(sub, max_size=3).map(lambda xs: f"[{', '.join(xs)}]"),
    )


def stmt(depth):
    e = expr(2)
    if depth <= 0:
        return st.one_of(
            st.tuples(NAMES, e).map(lambda t: f"var {t[0]} = {t[1]};"),
            e.map(lambda x: f"{x};"),
            st.tuples(NAMES, e).map(lambda t: f"{t[0]} = {t[1]};"),
            st.just("return;"),
        )
    body = st.lists(stmt(depth - 1), max_size=3).map(lambda xs: " ".join(xs))
    return st.one_of(
        stmt(0),
        st.tuples(e, body).map(lambda t: f"if ({t[0]}) {{ {t[1]} }}"),
        st.tuples(e, body, body).map(
            lambda t: f"if ({t[0]}) {{ {t[1]} }} else {{ {t[2]} }}"),
        st.tuples(e, body).map(lambda t: f"while ({t[0]}) {{ {t[1]} }}"),
        st.tuples(NAMES, st.lists(NAMES, max_size=2), body).map(
            lambda t: f"function {t[0]}({', '.join(t[1])}) {{ {t[2]} }}"),
        st.tuples(NAMES, e, body).map(
            lambda t: f"for (var {t[0]} in {t[1]}) {{ {t[2]} }}"),
    )


PROGRAMS = st.lists(stmt(2), min_size=1, max_size=6).map(lambda xs: "\n".join(xs))


@settings(max_examples=60, deadline=None)
@given(PROGRAMS)
def test_random_programs_build_valid_cpgs(src):
    cpg = build_cpg(src)
    # invariant: ids assigned, orders set on AST children
    for n in cpg.nodes:
        assert n.id >= 0
    # invariant: one METHOD_RETURN per method, parameters ordered by index
    for m in cpg.methods():
        rets = [c for c in cpg.ast_children(m) if c.label == "METHOD_RETURN"]
        assert len(rets) == 1, (src, m.name)
        params = cpg.parameters(m)
        assert [p.index for p in params] == sorted(p.index for p in params)
    # invariant: CFG edges connect CFG nodes only
    for e in cpg.edges:
        if e.label == "CFG":
            assert e.src.label in CFG_NODE_LABELS
            assert e.dst.label in CFG_NODE_LABELS
        if e.label == "REACHING_DEF":
            assert e.src.is_cfg_node and e.dst.is_cfg_node
    # invariant: every non-external method body's CFG is anchored at the method
    for m in cpg.methods():
        if m.is_external:
            continue
        assert cpg.out(m, "CFG"), f"method {m.name} has no CFG start: {src!r}"


@settings(max_examples=30, deadline=None)
@given(PROGRAMS)
def test_scan_never_crashes(src):
    from joern_spark.query.cpgql import Q
    from joern_spark.query.scan import default_bundle

    cpg = build_cpg(src)
    q = Q(cpg)
    for query in default_bundle():
        n = query.matcher(cpg, q)
        assert n >= 0


# robustness: arbitrary garbage must terminate quickly (parse or raise) —
# an infinite lexer/parser loop inside the build UDF would stall an
# executor core at corpus scale, which is worse than any parse error
@settings(max_examples=150, deadline=2000)
@given(st.text(
    alphabet="(){}[]<>=,;.\"'`abcXY_123 \n\\/*-+?:!&|%$#@~^\t",
    max_size=160))
def test_parser_terminates_on_garbage(src):
    from joern_spark.frontends.js.jsparser import ParseError, parse
    try:
        parse(src)
    except (ParseError, RecursionError):
        pass


@settings(max_examples=40, deadline=5000)
@given(st.text(alphabet="(){}<>=,;\"'`abc123 \n/*-+?:!&|", max_size=120))
def test_build_terminates_on_garbage(src):
    """The full build path is exception-safe per document (the scan UDF
    catches; nothing may hang)."""
    try:
        build_cpg(src, "garbage.js")
    except Exception:
        pass


# the byte-identity contract (BASELINE.json input_hint): every extractor
# is a SAME-LENGTH transform with newlines preserved, for ANY input
@settings(max_examples=150, deadline=2000)
@given(st.text(
    alphabet="<>/scriptejnd %=-\"'{}()[]abc123\n\t&;!?*",
    max_size=300))
def test_extractors_preserve_length_on_garbage(src):
    from joern_spark.cpg.astlower import vue_parse_source
    from joern_spark.extract import extract_script_text, preprocess_ejs

    for fn in (extract_script_text, preprocess_ejs, vue_parse_source):
        out = fn(src)
        assert len(out) == len(src), fn.__name__
        assert [i for i, c in enumerate(src) if c == "\n"] == \
            [i for i, c in enumerate(out) if c == "\n"], fn.__name__


# the EJS ingestion route (round 4): lowering a .ejs document must never
# crash, and the fake `ap` callee must never leak into call or
# identifier names — whatever garbage the template contains
@settings(max_examples=60, deadline=5000)
@given(st.text(
    alphabet="<>%=-_# /scriptejnd\"'{}()[]abc123,\n;.!", max_size=200))
def test_ejs_route_terminates_and_never_leaks_ap(src):
    try:
        cpg = build_cpg(src, "fuzz.ejs")
    except Exception:
        return
    names = {n.name for n in cpg.nodes_by_label("CALL")} \
        | {n.name for n in cpg.nodes_by_label("IDENTIFIER")}
    assert "ap" not in names

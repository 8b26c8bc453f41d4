"""Extractor parity tests: byte-offset-preserving script extraction + EJS
preprocessing semantics (reference: EjsPreprocessor.scala:19-96); the
byte-identical-text-per-url invariant of BASELINE.json input_hint."""

from __future__ import annotations

from joern_spark.extract import extract_script_text, preprocess_ejs
from joern_spark.sources.corpus import page_for


def test_length_preservation_and_body():
    html = "<html><body><script>var a = 1;\nuse(a);</script><p>x</p></body></html>"
    out = extract_script_text(html)
    assert len(out) == len(html)
    assert "var a = 1;" in out
    assert "use(a);" in out
    assert "<p>" not in out
    # everything outside script bodies is spaces (newlines preserved)
    body_start = html.index("var a")
    assert out[:body_start].strip() == ""


def test_newlines_preserved():
    html = "<html>\n<body>\n<script>\nvar x = 1;\n</script>\n</body>\n</html>"
    out = extract_script_text(html)
    assert out.count("\n") == html.count("\n")
    # line numbers of the script body are identical
    assert html.split("\n").index("var x = 1;") == out.split("\n").index("var x = 1;")


def test_multiple_scripts():
    html = "<script>a();</script><div>t</div><script>b();</script>"
    out = extract_script_text(html)
    assert "a();" in out and "b();" in out and "div" not in out
    assert len(out) == len(html)


def test_ejs_preprocess_scriptlet_semicolon():
    # scriptlet without terminator gets `;` at the closing tag position,
    # output length preserved (EjsPreprocessor.scala:86-89)
    code = "<p><% var x = 1 %></p>"
    out = preprocess_ejs(code)
    assert len(out) == len(code)
    assert " var x = 1 ;" in out
    assert "<p>" not in out


def test_ejs_output_tag_becomes_call():
    # <%= expr %> → ap(expr); (EjsPreprocessor.scala:77-85)
    code = "<div><%= user.name %></div>"
    out = preprocess_ejs(code)
    assert len(out) == len(code)
    assert "ap(" in out
    assert ");" in out
    assert "user.name" in out


def test_ejs_comment_ignored():
    code = "<span><%# a comment %></span>"
    out = preprocess_ejs(code)
    assert len(out) == len(code)
    assert out.strip() == ""


def test_corpus_golden_text_matches_extractor():
    # corpus generator's `text` column IS the extraction golden
    for i in (0, 7, 33):
        url, ts, html, text = page_for(i)
        assert extract_script_text(html.decode()) == text


def test_page_for_extra_js_stays_byte_consistent():
    """The near-dup injection hook appends into the snippet BEFORE html
    assembly, so html and extracted text remain byte-consistent and the
    page is a NEAR (not exact) duplicate of its base family."""
    for i in (0, 7, 33):
        url, ts, html, text = page_for(i, extra_js=f"var uniq_{i} = {i};")
        assert extract_script_text(html.decode()) == text
        assert f"uniq_{i}" in text
        base_text = page_for(i)[3]
        assert text != base_text
        # the shared snippet body is a common prefix (near-dup, not
        # disjoint): strip the blanked-gap padding and compare
        assert text.strip().startswith(base_text.strip())


def test_multi_script_page_builds_one_program():
    """Two <script> blocks on one page → one length-preserving text → one
    CPG whose :program carries both scripts' functions (the reference
    concatenates a file's scripts the same way: blanked gaps keep offsets)."""
    from joern_spark.cpg.build import build_cpg
    from joern_spark.query.cpgql import Q

    html = ("<html><script>function a1() { source(); }</script>"
            "<p>gap</p><script>function b2() { sink(a1()); }</script></html>")
    text = extract_script_text(html)
    assert len(text) == len(html)
    cpg = build_cpg(text, "multi")
    q = Q(cpg)
    names = {m.name for m in cpg.methods()}
    assert {"a1", "b2"} <= names
    # cross-script call resolves (same program scope)
    callees = {n.name for n in q.call().name_exact("a1").callee().l()}
    assert "a1" in callees

"""Ports of jssrc2cpg MinifiedFileDetectionTests.scala and
TranspiledFileDetectionTests.scala against sources/file_filter.py
(AstGenRunner.scala:128-216 semantics).  The reference asserts
``cpg.file.name.l`` after project ingestion; here the same selection runs
as ``select_project_files`` over (path, text) pairs, so the assertions
compare kept paths (sorted, as file.name.l is)."""

from __future__ import annotations

from joern_spark.sources.file_filter import (
    is_minified_file, select_project_files,
)


def kept(files):
    return sorted(p for p, _ in select_project_files(files))


# MinifiedFileDetectionTests.scala:9-18 (skip minified files by name)
def test_skip_minified_by_name():
    files = [("a.min.js", ""), ("a.min.23472420.js", ""), ("b-min.js", ""),
             ("b-min.23472420.js", ""), ("c.bundle.js", "")]
    assert kept(files) == []


# MinifiedFileDetectionTests.scala:19-22 (skip minified files by content)
def test_skip_minified_by_content():
    files = [("code.js", "console.log('" + "x" * 10000 + "');")]
    assert kept(files) == []
    # below threshold → kept
    assert kept([("code.js", "console.log('" + "x" * 9000 + "');")]) \
        == ["code.js"]
    # long line but >50 lines → not minified (AstGenRunner.scala:158)
    long_many = "console.log('" + "x" * 10000 + "');\n" + "var a;\n" * 60
    assert is_minified_file("big.js", long_many) is False


# TranspiledFileDetectionTests.scala:9-19 (source map comment + sibling)
def test_skip_transpiled_with_sourcemap_comment():
    files = [("index.js", "\nconsole.log('Hello World!');\n//sourceMappingURL=foo\n"),
             ("index.ts", "console.log('Hello World!');")]
    assert kept(files) == ["index.ts"]


# TranspiledFileDetectionTests.scala:21-27 (source map file + sibling)
def test_skip_transpiled_with_sourcemap_file():
    files = [("index.ts", "console.log('Hello World!');"),
             ("index.js", "console.log('Hello World!');"),
             ("index.js.map", "")]
    assert kept(files) == ["index.ts"]


# TranspiledFileDetectionTests.scala:29-37 (ejs skipped when transpiled
# output exists; the transpiled .js is kept for its ejs source)
def test_skip_ejs_when_transpiled_exists():
    files = [("index.vue", "console.log('Hello World!');"),
             ("index.ejs", "console.log('Hello World!');"),
             ("index.js", "console.log('Hello World!');"),
             ("index.js.map", "")]
    assert kept(files) == ["index.js", "index.vue"]


# TranspiledFileDetectionTests.scala:39-44 (no transpiled file → ejs kept)
def test_keep_ejs_without_transpiled():
    files = [("index.vue", "console.log('Hello World!');"),
             ("index.ejs", "console.log('Hello World!');")]
    assert kept(files) == ["index.ejs", "index.vue"]


# TranspiledFileDetectionTests.scala:46-49 (no source map → both kept)
def test_keep_without_sourcemap():
    files = [("index.ts", "console.log('Hello World!');"),
             ("index.js", "console.log('Hello World!');")]
    assert kept(files) == ["index.js", "index.ts"]


# TranspiledFileDetectionTests.scala:51-54 (map file but no same-stem
# sibling → kept)
def test_keep_with_map_but_no_sibling():
    files = [("index.js", "console.log('Hello World!');"),
             ("index.js.map", "")]
    assert kept(files) == ["index.js"]


# TranspiledFileDetectionTests.scala:56-66 (map comment but no sibling →
# kept)
def test_keep_with_comment_but_no_sibling():
    files = [("index.js",
              "\nconsole.log('Hello World!');\n//sourceMappingURL=foo\n")]
    assert kept(files) == ["index.js"]


# AstGenRunner.scala:51-59 / :61-80 default-ignore regexes
def test_default_ignores():
    files = [("app.spec.js", "x"), ("app-test.js", "x"),
             ("webpack.config.js", "x"), ("lib.d.ts", "x"),
             ("Gruntfile.js", "x"), ("app.js", "x")]
    assert kept(files) == ["app.js"]

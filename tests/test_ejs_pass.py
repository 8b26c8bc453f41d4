"""Ported reference goldens: jssrc2cpg EjsPassTests.scala — the EJS
ingestion route: preprocess to a same-length JS view (output tags →
`ap(...)`), parse that, read all code fields from the ORIGINAL template
(AstGenRunner.scala processEjsFiles keeps the original under the .ejs
name), and rename the fake `ap` output call by peeking at the char after
the `<%` callee span (AstCreatorHelper.ejsOutputCallName: `=` → escapeFn,
`-` → __append)."""

from __future__ import annotations

import os
import tempfile

from joern_spark.cpg.build import build_project

EJS_SIMPLE = """
<body>
<h1>Welcome <%= user.name %></h1>
</body>
"""

EJS_FULL = """
<body>

<h1>Welcome <%= user.name %></h1>

<b><%_ foo.callWithWhitespaces() _%></b>

<b><%- foo.callUnescaped() -%></b>

<%# Just a comment here #%>
<% if (admin) { %>
    <a href="/admin">Admin</a>
<% } %>

<ul>
    <% friends.forEach(function(friend, index) { %>
        <li class="<%= index === 0 ? "first" : "" %> <%= friend.name === selected ? "selected" : "" %>"><%= friend.name %></li>
    <% }); %>
</ul>

<%
console.log(user);
exampleWrite = 'some value';
%>

</body>
"""

EJS_INVALID = """
<body>
<h1>Welcome <%@#$= user.name %></h1>
</body>
"""


def _write(d, name, content):
    p = os.path.join(d, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(content)


def _calls(cpg, name):
    return [n for n in cpg.nodes_by_label("CALL") if n.name == name]


def _arg1_codes(cpg, name):
    # reference .argument(1): argumentIndex == 1 (0 is the receiver base)
    out = []
    for c in _calls(cpg, name):
        for a in cpg.arguments(c):
            if a.argument_index == 1:
                out.append(a.code)
    return out


# EjsPassTests.scala:10-21 ("be renamed correctly")
def test_ejs_file_renamed_correctly():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "index.js.ejs", EJS_SIMPLE)
        cpg = build_project(d)
        assert sorted(n.name for n in cpg.nodes_by_label("FILE")) \
            == ["index.js.ejs"]
        assert _arg1_codes(cpg, "escapeFn") == ["user.name"]


# EjsPassTests.scala:23-35 ("be ignored at folders excluded by default")
def test_ejs_excluded_folders():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "index.js.ejs", EJS_SIMPLE)
        _write(d, "node_modules/foo.js.ejs", EJS_SIMPLE)
        _write(d, "vendor/bar.js.ejs", EJS_SIMPLE)
        _write(d, "www/baz.js.ejs", EJS_SIMPLE)
        cpg = build_project(d)
        assert sorted(n.name for n in cpg.nodes_by_label("FILE")) \
            == ["index.js.ejs"]
        assert _arg1_codes(cpg, "escapeFn") == ["user.name"]


# EjsPassTests.scala:37-84 ("be handled correctly")
def test_ejs_handled_correctly():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "index.ejs", EJS_FULL)
        cpg = build_project(d)
        assert sorted(n.name for n in cpg.nodes_by_label("FILE")) \
            == ["index.ejs"]
        # unescaped output <%- %> -> __append wrapping the raw expression
        assert _arg1_codes(cpg, "__append") == ["foo.callUnescaped()"]
        # escaped output <%= %> -> escapeFn, one per output expression
        assert sorted(_arg1_codes(cpg, "escapeFn")) == [
            "friend.name",
            'friend.name === selected ? "selected" : ""',
            'index === 0 ? "first" : ""',
            "user.name",
        ]
        call_names = {n.name for n in cpg.nodes_by_label("CALL")}
        assert {"callWithWhitespaces", "forEach", "log",
                "callUnescaped"} <= call_names
        assert "ap" not in call_names
        assert "ap" not in {n.name for n in cpg.nodes_by_label("IDENTIFIER")}


# EjsPassTests.scala:86-96 ("invalid EJS file test")
def test_ejs_invalid_file_dropped():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "index.js.ejs", EJS_INVALID)
        cpg = build_project(d)
        assert cpg.nodes_by_label("FILE") == []

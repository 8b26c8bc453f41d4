"""Code dumping: Method.content / TypeDecl.content / dumpRaw.

Behavioral port of the reference's content accessors + CodeDumper
(semanticcpg CodeDumper.scala, exercised by jssrc2cpg
CodeDumperFromContentTests.scala): a node's ``content`` is the source
slice [offset, offsetEnd) of its enclosing FILE's stored text; ``dumpRaw``
renders that slice with a ``/* <=== fullName */`` marker on the first
line.  FILE nodes carry the original text (astlower stores the same str
object — no copy), so this works per document with no filesystem access,
exactly what a corpus-scale UDF needs.
"""

from __future__ import annotations

from typing import Optional

from joern_spark.cpg.core import Cpg, Node


def file_content(cpg: Cpg) -> str:
    for f in cpg.nodes_by_label("FILE"):
        if f.content:
            return f.content
    return ""


def _typedecl_span(cpg: Cpg, n: Node) -> "Optional[tuple[int, int]]":
    cur = cpg.ast_parent(n)
    while cur is not None:
        if cur.label == "TYPE_DECL" and cur.start is not None \
                and cur.end is not None and cur.end > cur.start:
            return cur.start, cur.end
        cur = cpg.ast_parent(cur)
    return None


def node_content(cpg: Cpg, n: Node) -> str:
    """Method.content / TypeDecl.content: the [offset, offsetEnd) source
    slice.  The synthesized constructor / <clinit> have zero-width spans —
    the reference assigns them their class's offsets, so fall back to the
    enclosing TYPE_DECL span; :program (no span) is the whole file."""
    src = file_content(cpg)
    start, end = n.start, n.end
    if start is None or end is None or end <= start:
        span = _typedecl_span(cpg, n)
        if span is not None:
            start, end = span
        else:
            return src
    return src[start:end]


def dump_raw(cpg: Cpg, n: Node) -> str:
    """CodeDumper raw dump: content lines with the location marker
    appended to the first line."""
    lines = node_content(cpg, n).split("\n")
    if lines:
        lines[0] = f"{lines[0]} /* <=== {n.full_name} */"
    return "\n".join(lines)

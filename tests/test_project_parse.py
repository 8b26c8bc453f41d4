"""Ported reference goldens: jssrc2cpg ProjectParseTests.scala —
directory-project ingestion via build_project (file filters, per-file
parse recovery, relative FILE names, utf8, strange filenames)."""

from __future__ import annotations

import os
import tempfile

from joern_spark.cpg.build import build_project
from joern_spark.query.cpgql import Q


def _write(d, name, content):
    p = os.path.join(d, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(content)


def _file_names(cpg):
    return sorted(n.name for n in cpg.nodes_by_label("FILE"))


# ProjectParseTests.scala:92-99 (generate correct filenames)
def test_correct_filenames():
    with tempfile.TemporaryDirectory() as d:
        for f in ("sub/c.js", "sub/d.js", "a.js", "b.js"):
            _write(d, f, f'console.log("{f}");')
        cpg = build_project(d)
        assert set(_file_names(cpg)) >= {"a.js", "b.js", "sub/c.js",
                                         "sub/d.js"}


# ProjectParseTests.scala:101-103 (recover from broken input file)
def test_recover_from_broken_file():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "good.js", 'console.log("good");')
        _write(d, "broken.js", 'console.log("broken')
        cpg = build_project(d)
        names = _file_names(cpg)
        assert "good.js" in names
        assert "broken.js" not in names


# ProjectParseTests.scala:105-107 (handle utf8 correctly)
def test_utf8():
    with tempfile.TemporaryDirectory() as d:
        _write(d, "utf8.js", "\n// 😼\nlogger.error()\n")
        cpg = build_project(d)
        fas = (Q(cpg).call().name_exact("<operator>.fieldAccess")
               .argument(2).l())
        assert [n.code for n in fas] == ["error"]


# ProjectParseTests.scala:109-112 (handle strange filenames correctly)
def test_strange_filenames():
    with tempfile.TemporaryDirectory() as d:
        for f in ("good_%component-name%_.js", "good_%component-name%_Foo.js"):
            _write(d, f, f'console.log("{f}");')
        for f in ("broken_%component-name%_.js",
                  "broken_%component-name%_Foo.js"):
            _write(d, f, "const x = new <%ComponentName%>Foo();")
        cpg = build_project(d)
        assert _file_names(cpg) == ["good_%component-name%_.js",
                                    "good_%component-name%_Foo.js"]

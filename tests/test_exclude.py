"""Ported reference goldens: jssrc2cpg ExcludeTests.scala — user
--exclude / --exclude-regex on top of the default ignore rules."""

from __future__ import annotations

import pytest

from joern_spark.sources.file_filter import select_project_files

ROOT = "/proj"

TEST_FILES = [
    ".sub/e.js",
    "folder/b.js",
    "folder/c.js",
    "foo.bar/d.js",
    "tests/a.spec.js",
    "tests/b.mock.js",
    "tests/c.e2e.js",
    "tests/d.test.js",
    "a.js",
    "b-min.js",
    "c.spec.js",
    "d.chunk.js",
    "index.js",
]


def _kept(exclude=(), exclude_regex=""):
    files = [(p, "") for p in TEST_FILES]
    return {p for p, _ in select_project_files(
        files, ignored_files=tuple(exclude),
        ignored_files_regex=exclude_regex, root=ROOT)}


# ExcludeTests.scala:66-146 (the parameterized table, one case per row)
CASES = [
    ("exclude nothing if no excludes are given", [], "",
     {"index.js", "a.js", "folder/b.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude a file with --exclude with relative path", ["index.js"], "",
     {"a.js", "folder/b.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude files with --exclude with relative paths",
     ["index.js", "folder/b.js"], "",
     {"a.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude a file with --exclude with absolute path",
     [f"{ROOT}/index.js"], "",
     {"a.js", "folder/b.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude files with --exclude with absolute paths",
     [f"{ROOT}/index.js", f"{ROOT}/folder/b.js"], "",
     {"a.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude files with --exclude with mixed paths",
     ["index.js", f"{ROOT}/folder/b.js"], "",
     {"a.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude a folder with --exclude with absolute path",
     [f"{ROOT}/folder/"], "",
     {"a.js", "index.js", "foo.bar/d.js"}),
    ("exclude a folder with --exclude with relative path",
     ["folder/"], "",
     {"a.js", "index.js", "foo.bar/d.js"}),
    ("exclude a file with --exclude-regex", [], r".*index\..*",
     {"a.js", "folder/b.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude files with --exclude-regex", [], r".*(index|b)\..*",
     {"a.js", "folder/c.js", "foo.bar/d.js"}),
    ("exclude a complete folder with --exclude-regex", [],
     r".*/?folder/.*",
     {"index.js", "a.js", "foo.bar/d.js"}),
    ("exclude files with --exclude and --exclude-regex", ["a.js"],
     r".*(index|b)\..*",
     {"folder/c.js", "foo.bar/d.js"}),
]


@pytest.mark.parametrize("statement,exclude,exclude_regex,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_excludes(statement, exclude, exclude_regex, expected):
    assert _kept(exclude, exclude_regex) == expected

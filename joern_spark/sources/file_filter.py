"""Project file selection: minified / transpiled / default-ignore filters.

Behavioral port of the reference's AstGenRunner file filtering
(jssrc2cpg/src/main/.../utils/AstGenRunner.scala:15-216):

- ``isMinifiedFile`` (:152-164): name regex ``.*([.-]min\\..*js|bundle\\.js)``
  or a ``.js`` file whose longest line is >= 10,000 chars with <= 50 lines.
- ``isIgnoredByDefault`` (:166-175): ignored-config regex, ignored-tests
  regex, or minified.
- ``isTranspiledFile`` (:177-199): a ``.js`` file with a
  ``//sourceMappingURL`` comment or a sibling ``<name>.js.map``, AND a
  sibling file with the same stem (the transpilation source).
- ``hasEjsSourceFile`` (:201-214) + ``processEjsFiles`` (:226-231): a
  transpiled ``.js`` with an ``.ejs`` sibling is KEPT (the ejs is skipped
  instead — the transpiled output is the richer artifact).

At corpus scale this runs as a column filter over (path, text) rows before
the CPG build fan-out — pure string predicates, no UDF state — so Catalyst
applies it at the scan.  For the web corpus the content heuristic doubles
as inline-``<script>`` minification detection.
"""

from __future__ import annotations

import re

LINE_LENGTH_THRESHOLD = 10_000  # AstGenRunner.scala:19
TYPE_DEFINITION_EXTENSIONS = (".t.ts", ".d.ts")  # :21

_MINIFIED_PATH_RE = re.compile(r".*([.-]min\..*js|bundle\.js)")  # :23

# AstGenRunner.scala:51-59
_IGNORED_TESTS_RE = [re.compile(p) for p in (
    r".*[.-]spec\.js", r".*[.-]mock\.js", r".*[.-]e2e\.js",
    r".*[.-]test\.js", r".*cypress\.json", r".*test.*\.json",
)]

# AstGenRunner.scala:28-49 (AstGenDefaultIgnoreRegex folder rules; the
# file-extension rule is covered by the tests/files regexes below)
_IGNORED_FOLDERS = (
    "node_modules", "venv", "docs", "test", "tests", "e2e", "e2e-beta",
    "examples", "cypress", "jest-cache", "eslint-rules", "codemods",
    "flow-typed", "i18n", "vendor", "www", "dist", "build",
)

# AstGenRunner.scala:61-80
_IGNORED_FILES_RE = [re.compile(p) for p in (
    r".*jest\.config.*", r".*webpack\..*\.js", r".*vue\.config\.js",
    r".*babel\.config\.js", r".*chunk-vendors.*\.js", r".*app~.*\.js",
    r".*\.chunk\.js", r".*\.babelrc.*", r".*\.eslint.*", r".*\.tslint.*",
    r".*\.stylelintrc\.js", r".*rollup\.config.*", r".*\.types\.js",
    r".*\.cjs\.js", r".*eslint-local-rules\.js", r".*\.devcontainer\.json",
    r".*Gruntfile\.js", r".*i18n.*\.json",
)]


def _stem(path: str) -> str:
    """nameWithoutExtension(includeAll=false): strip ONE extension
    ('index.js.map' → 'index.js', 'index.vue' → 'index')."""
    name = path.rsplit("/", 1)[-1]
    return name.rsplit(".", 1)[0] if "." in name else name


def _dir(path: str) -> str:
    return path.rsplit("/", 1)[0] if "/" in path else ""


def is_minified_file(path: str, text: str | None) -> bool:
    """AstGenRunner.isMinifiedFile (:152-164)."""
    if _MINIFIED_PATH_RE.fullmatch(path):
        return True
    if text is not None and path.endswith(".js"):
        lines = text.split("\n")
        longest = max((len(ln) for ln in lines), default=0)
        if longest >= LINE_LENGTH_THRESHOLD and len(lines) <= 50:
            return True
    return False


def is_ignored_by_default(path: str, text: str | None) -> bool:
    """AstGenRunner.isIgnoredByDefault (:166-175) + the default folder
    rules of AstGenDefaultIgnoreRegex (:28-49) + hidden directories
    (SourceFiles.determine skips dot-folders)."""
    segments = path.split("/")[:-1]
    if any(s.startswith(".") and s not in (".", "..") for s in segments):
        return True
    if any(s in _IGNORED_FOLDERS for s in segments):
        return True
    return (any(r.fullmatch(path) for r in _IGNORED_FILES_RE)
            or any(r.fullmatch(path) for r in _IGNORED_TESTS_RE)
            or is_minified_file(path, text))


def _is_ignored_by_user(path: str, ignored_files, ignored_regex,
                        root: str = "") -> bool:
    """Config.withIgnoredFiles / withIgnoredFilesRegex semantics
    (ExcludeTests.scala): entries are files or folders, relative to the
    project root or absolute; the regex full-matches the path."""
    candidates = {path}
    if root:
        candidates.add(f"{root.rstrip('/')}/{path}")
    for entry in ignored_files:
        e = entry.rstrip("/")
        for c in candidates:
            if c == e or c.startswith(e + "/"):
                return True
    if ignored_regex:
        rx = re.compile(ignored_regex)
        if any(rx.fullmatch(c) for c in candidates):
            return True
    return False


def _siblings(path: str, all_paths: set[str]) -> list[str]:
    d = _dir(path)
    return [p for p in all_paths if p != path and _dir(p) == d]


def is_transpiled_file(path: str, text: str | None, all_paths: set[str]) -> bool:
    """AstGenRunner.isTranspiledFile (:177-199): .js + source map evidence
    + a same-stem sibling (the transpilation source)."""
    if not path.endswith(".js"):
        return False
    has_map_comment = text is not None and "//sourceMappingURL" in text
    has_map_file = f"{path}.map" in all_paths
    if not (has_map_comment or has_map_file):
        return False
    me = _stem(path)
    return any(_stem(s) == me for s in _siblings(path, all_paths))


def _has_ejs_source(path: str, all_paths: set[str]) -> bool:
    """AstGenRunner.hasEjsSourceFile (:201-214)."""
    if not path.endswith(".js"):
        return False
    me = _stem(path)
    return any(s.endswith(".ejs") and _stem(s) == me
               for s in _siblings(path, all_paths))


def select_project_files(files: "list[tuple[str, str]]",
                         ignored_files: "tuple[str, ...]" = (),
                         ignored_files_regex: str = "",
                         root: str = "") -> "list[tuple[str, str]]":
    """AstGenRunner.fileFilter (:128-151) + the ejs rule of
    processEjsFiles (:226-231), over in-memory (path, text) pairs.
    ``ignored_files`` / ``ignored_files_regex`` are the user's --exclude /
    --exclude-regex; ``root`` is the absolute project path absolute
    excludes are written against.  Returns the kept pairs in input
    order."""
    all_paths = {p for p, _ in files}
    by_path = dict(files)
    kept = []
    for path, text in files:
        if any(path.endswith(ext) for ext in TYPE_DEFINITION_EXTENSIONS):
            continue
        if _is_ignored_by_user(path, ignored_files, ignored_files_regex, root):
            continue
        if is_ignored_by_default(path, text):
            continue
        if is_transpiled_file(path, text, all_paths) \
                and not _has_ejs_source(path, all_paths):
            continue
        if path.endswith(".ejs"):
            # skip ejs preprocessing when its transpiled .js output exists
            js = path[: -len(".ejs")] + ".js"
            if js in all_paths and is_transpiled_file(js, by_path.get(js), all_paths):
                continue
        if path.endswith(".map"):
            continue  # source maps are never source files
        kept.append((path, text))
    return kept

"""Ported reference goldens: jssrc2cpg DependenciesPassTests.scala
(DEPENDENCY nodes from package.json / package-lock.json via
PackageJsonParser semantics)."""

from __future__ import annotations

import os
import tempfile

from joern_spark.cpg.core import Cpg
from joern_spark.cpg.package_json import (
    PACKAGE_JSON_FILENAME, PACKAGE_JSON_LOCK_FILENAME,
    is_valid_project_package_json, run_dependencies_pass,
)


def _write(d, name, content):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(content)
    return p


# DependenciesPassTests.scala:18-24 (ignore empty package.json)
def test_ignore_empty_package_json():
    with tempfile.TemporaryDirectory() as d:
        p = _write(d, PACKAGE_JSON_FILENAME, "")
        assert is_valid_project_package_json(p) is False


# DependenciesPassTests.scala:26-41 (no useful content)
def test_ignore_package_json_without_useful_content():
    with tempfile.TemporaryDirectory() as d:
        p = _write(d, PACKAGE_JSON_FILENAME, """
{
  "name": "something",
  "version": "0.1.0",
  "description": "foobar",
  "main": "./target_node/index.js",
  "private": true
}
""")
        assert is_valid_project_package_json(p) is False


# DependenciesPassTests.scala:43-48 (no dependencies)
def test_ignore_package_json_without_dependencies():
    with tempfile.TemporaryDirectory() as d:
        p = _write(d, PACKAGE_JSON_FILENAME, "{}")
        assert is_valid_project_package_json(p) is False


# DependenciesPassTests.scala:50-53 (no dependencies at all)
def test_dependency_nodes_none():
    with tempfile.TemporaryDirectory() as d:
        _write(d, PACKAGE_JSON_FILENAME, "{}")
        cpg = Cpg()
        assert run_dependencies_pass(cpg, d) == []


# DependenciesPassTests.scala:55-66 (empty dependency table)
def test_dependency_nodes_empty_table():
    with tempfile.TemporaryDirectory() as d:
        _write(d, PACKAGE_JSON_FILENAME, '{\n  "dependencies": {\n  }\n}\n')
        cpg = Cpg()
        assert run_dependencies_pass(cpg, d) == []


# DependenciesPassTests.scala:68-88 (simple lock dependencies)
def test_dependency_nodes_from_lock_file():
    with tempfile.TemporaryDirectory() as d:
        _write(d, PACKAGE_JSON_LOCK_FILENAME, """
{
  "dependencies": {
    "dep1": {
      "version": "0.1"
    },
    "dep2": {
      "version": "0.2"
    }
  }
}
""")
        cpg = Cpg()
        dep_a, dep_b = run_dependencies_pass(cpg, d)
        assert (dep_a.name, dep_a.version) == ("dep1", "0.1")
        assert (dep_b.name, dep_b.version) == ("dep2", "0.2")


# DependenciesPassTests.scala:90-103 (simple dependency)
def test_dependency_nodes_simple():
    with tempfile.TemporaryDirectory() as d:
        _write(d, PACKAGE_JSON_FILENAME,
               '{\n  "dependencies": {\n    "dep1": "0.1"\n  }\n}\n')
        cpg = Cpg()
        (dep_a,) = run_dependencies_pass(cpg, d)
        assert (dep_a.name, dep_a.version) == ("dep1", "0.1")
        assert is_valid_project_package_json(
            os.path.join(d, PACKAGE_JSON_FILENAME)) is True


# DependenciesPassTests.scala:105-133 (all four dependency tables)
def test_dependency_nodes_all_tables():
    with tempfile.TemporaryDirectory() as d:
        _write(d, PACKAGE_JSON_FILENAME, """
{
  "dependencies": {
    "dep1": "0.1"
  },
  "devDependencies": {
    "dep2": "0.2"
  },
  "peerDependencies": {
    "dep3": "0.3"
  },
  "optionalDependencies": {
    "dep4": "0.4"
  }
}
""")
        cpg = Cpg()
        deps = run_dependencies_pass(cpg, d)
        assert [(x.name, x.version) for x in deps] == [
            ("dep1", "0.1"), ("dep2", "0.2"), ("dep3", "0.3"), ("dep4", "0.4")]


# node_modules exclusion (DependenciesPass.scala:20-23)
def test_node_modules_excluded():
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "node_modules", "pkg"))
        _write(os.path.join(d, "node_modules", "pkg"), PACKAGE_JSON_FILENAME,
               '{"dependencies": {"hidden": "9.9"}}')
        _write(d, PACKAGE_JSON_FILENAME,
               '{"dependencies": {"dep1": "0.1"}}')
        cpg = Cpg()
        deps = run_dependencies_pass(cpg, d)
        assert [(x.name, x.version) for x in deps] == [("dep1", "0.1")]

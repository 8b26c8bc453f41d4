"""ConfigPass + PrivateKeyFilePass — CONFIG_FILE nodes for project
configuration artifacts (jssrc2cpg passes/ConfigPass.scala).

- ConfigPass: `.json`, `.config.js`, `.conf.js`, `.vue`, `.html`, `.pug`
  files (node_modules excluded), content inlined.
- PrivateKeyFilePass: `*.key` files containing an RSA PRIVATE KEY header;
  content is redacted (ConfigPass.scala:58-71).

Spark mapping: at corpus scale config files arrive as rows of a
(path, content) table; these functions also accept such pairs directly so
the Spark job never touches a local filesystem.
"""

from __future__ import annotations

import os

from joern_spark.cpg.core import Cpg, Node

SELECTED_EXTENSIONS = (".json", ".config.js", ".conf.js", ".vue", ".html", ".pug")
NODE_MODULES = "node_modules"
PRIVATE_KEY_MARKER = "BEGIN RSA PRIVATE KEY"
REDACTED = "Content omitted for security reasons."


def _project_files(input_path: str, suffixes) -> list[str]:
    out = []
    for root, dirs, files in os.walk(input_path):
        dirs[:] = sorted(d for d in dirs if d != NODE_MODULES)
        for f in sorted(files):
            p = os.path.join(root, f)
            if NODE_MODULES in p.split(os.sep):
                continue
            if any(f.endswith(s) for s in suffixes):
                out.append(p)
    return sorted(out, key=lambda p: os.path.relpath(p, input_path))


def run_config_pass(cpg: Cpg, input_path: str) -> list[Node]:
    """CONFIG_FILE node per selected config file (name = project-relative
    path, content inlined)."""
    nodes = []
    for p in _project_files(input_path, SELECTED_EXTENSIONS):
        with open(p, encoding="utf-8", errors="replace") as f:
            content = f.read()
        node = Node("CONFIG_FILE", name=os.path.relpath(p, input_path),
                    content=content, code="<empty>")
        cpg.add_node(node)
        nodes.append(node)
    return nodes


def run_private_key_pass(cpg: Cpg, input_path: str) -> list[Node]:
    """CONFIG_FILE per RSA private-key file, content REDACTED."""
    nodes = []
    for p in _project_files(input_path, (".key",)):
        with open(p, encoding="utf-8", errors="replace") as f:
            content = f.read()
        if PRIVATE_KEY_MARKER not in content:
            continue
        node = Node("CONFIG_FILE", name=os.path.relpath(p, input_path),
                    content=REDACTED, code="<empty>")
        cpg.add_node(node)
        nodes.append(node)
    return nodes

"""Generate API.md: the package's public surface from source docstrings.

One bullet per public top-level function/class (first docstring
paragraph), grouped by module. Run from the repo root after adding
operators:  python tools/gen_api_md.py
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def first_para(doc: str | None) -> str:
    if not doc:
        return ""
    para = doc.strip().split("\n\n")[0]
    return " ".join(ln.strip() for ln in para.splitlines())


def main() -> None:
    out = ["# API — public surface of p2pddsketch_spark",
           "",
           "Generated from source docstrings (first paragraph) by "
           "`tools/gen_api_md.py`; regenerate after adding operators.",
           ""]
    for root, dirs, files in sorted(
            os.walk(os.path.join(REPO, "p2pddsketch_spark"))):
        dirs[:] = sorted(d for d in dirs if not d.startswith("__"))
        for f in sorted(files):
            if not f.endswith(".py") or f.startswith("_"):
                continue
            abspath = os.path.join(root, f)
            path = os.path.relpath(abspath, REPO)
            tree = ast.parse(open(abspath).read())
            mod_doc = first_para(ast.get_docstring(tree))
            entries = []
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and \
                        not node.name.startswith("_"):
                    kind = "class" if isinstance(node, ast.ClassDef) else "def"
                    entries.append((kind, node.name,
                                    first_para(ast.get_docstring(node))))
            if not entries:
                continue
            out.append(f"## `{path}`")
            out.append("")
            if mod_doc:
                out += [mod_doc, ""]
            for kind, name, doc in entries:
                out.append(f"- **{name}** ({kind}) — {doc or '(no docstring)'}")
            out.append("")
    with open(os.path.join(REPO, "API.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"API.md: {sum(1 for l in out if l.startswith('- **'))} entries")


if __name__ == "__main__":
    main()

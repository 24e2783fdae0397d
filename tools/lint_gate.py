"""Dependency-free static gate (SURVEY §5: -Werror-equivalent strictness).

The CI additionally runs ruff + mypy (ci.yml), but those aren't
installable in every dev environment this repo targets, so the
must-stay-green subset is enforced by this stdlib-only checker:

  - syntax (compile() of every file)
  - unused imports (the most common dead-code rot; ``# noqa`` on the
    import line opts out, e.g. for re-exports and import-for-effect)
  - trailing whitespace / tab indentation
  - line length > 92 columns
  - mutable default arguments

Run: python tools/lint_gate.py  (exit 1 on any finding).
"""

from __future__ import annotations

import ast
import pathlib
import sys

MAX_LINE = 92
SKIP_PARTS = {".git", "__pycache__", ".claude", "build"}


def iter_files(root: pathlib.Path):
    for p in sorted(root.rglob("*.py")):
        if not SKIP_PARTS.intersection(p.parts):
            yield p


def _binding_names(node):
    """Names an import statement binds -> [(name, lineno)]."""
    out = []
    if isinstance(node, ast.Import):
        for a in node.names:
            out.append(((a.asname or a.name.split(".")[0]), node.lineno))
    elif isinstance(node, ast.ImportFrom):
        for a in node.names:
            if a.name == "*":
                continue
            out.append(((a.asname or a.name), node.lineno))
    return out


def check_file(path: pathlib.Path) -> list[str]:
    rel = path
    src = path.read_text()
    probs = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]

    lines = src.splitlines()
    noqa = {i + 1 for i, ln in enumerate(lines) if "# noqa" in ln}
    for i, ln in enumerate(lines, 1):
        if ln != ln.rstrip():
            probs.append(f"{rel}:{i}: trailing whitespace")
        if ln[:len(ln) - len(ln.lstrip())].count("\t"):
            probs.append(f"{rel}:{i}: tab indentation")
        if len(ln) > MAX_LINE and i not in noqa:
            probs.append(f"{rel}:{i}: line too long ({len(ln)} > {MAX_LINE})")

    # unused imports: a binding never referenced by name anywhere else
    used = set()
    imports = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(node)
        elif isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass                      # root is a Name, already collected
    # names re-exported via __all__ count as used
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign) and
                any(isinstance(t, ast.Name) and t.id == "__all__"
                    for t in node.targets)):
            for elt in getattr(node.value, "elts", []):
                if isinstance(elt, ast.Constant):
                    used.add(str(elt.value))
    for node in imports:
        if node.lineno in noqa:
            continue
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue
        for name, lineno in _binding_names(node):
            if name not in used:
                probs.append(f"{rel}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                    d for d in node.args.kw_defaults if d is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    probs.append(f"{rel}:{d.lineno}: mutable default "
                                 f"argument in {node.name}()")
    return probs


def main() -> int:
    root = pathlib.Path(__file__).resolve().parent.parent
    probs = []
    n = 0
    for p in iter_files(root):
        n += 1
        probs.extend(check_file(p.relative_to(root)))
    for msg in probs:
        print(msg)
    print(f"lint_gate: {n} files, {len(probs)} findings",
          file=sys.stderr)
    return 1 if probs else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Pyflakes-level lint (stdlib-only: the image ships no pyflakes/ruff).

Checks, per file, via one AST walk:
  - unused imports (imported name never referenced, incl. in annotations —
    with ``from __future__ import annotations`` the AST still carries the
    annotation expressions, so names used only in annotations count),
  - undefined names (a Name load that is never bound anywhere in the
    file, not imported, and not a builtin — the bug class behind
    VERDICT r2 weak #6, ``Any`` used without an import and masked by the
    future-annotations import).

Scope-insensitive by design: any binding anywhere in the file counts, so
there are no scoping false positives, at the cost of missing
use-before-def within a scope (pyflakes' remit, not ours).

Exit code 1 when any finding is reported — ``make lint`` fails on it.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

# names that are implicitly defined or conventionally module-level
IMPLICIT = {"__name__", "__file__", "__doc__", "__package__", "__spec__",
            "__loader__", "__builtins__", "__debug__", "__path__",
            "__all__", "__version__", "__class__"}


def check_file(path: Path) -> list[str]:
    src = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    imports: dict[str, int] = {}   # bound name -> lineno
    bindings: set[str] = set(IMPLICIT)
    loads: set[str] = set()

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imports[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imports[a.asname or a.name] = node.lineno
        elif isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                loads.add(node.id)
            else:  # Store / Del
                bindings.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bindings.add(node.name)
        elif isinstance(node, ast.arg):
            bindings.add(node.arg)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bindings.add(node.name)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bindings.update(node.names)
        elif isinstance(node, ast.alias):  # `with ... as x` handled by Name
            pass
        elif isinstance(node, ast.MatchAs) and node.name:
            bindings.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            bindings.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bindings.add(node.rest)

    problems = []
    # __init__.py files re-export by importing; skip their unused check
    if path.name != "__init__.py":
        for name, lineno in sorted(imports.items(), key=lambda kv: kv[1]):
            if name not in loads and f"\"{name}\"" not in src \
                    and f"'{name}'" not in src:
                problems.append(
                    f"{path}:{lineno}: '{name}' imported but unused")

    defined = bindings | set(imports) | set(dir(builtins))
    lineno_of: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load) \
                and node.id not in lineno_of:
            lineno_of[node.id] = node.lineno
    for name in sorted(loads - defined):
        problems.append(
            f"{path}:{lineno_of.get(name, 0)}: undefined name '{name}'")
    return problems


def main(argv: list[str]) -> int:
    targets = argv or ["m2tts_tpu", "scripts", "tests",
                       "bench.py", "__graft_entry__.py"]
    files: list[Path] = []
    for t in targets:
        p = Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    problems = []
    for f in files:
        problems.extend(check_file(f))
    for p in problems:
        print(p)
    if problems:
        print(f"lint: {len(problems)} problem(s) in {len(files)} files",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

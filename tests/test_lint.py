"""The stdlib linter (scripts/lint.py) must fail on real findings.

VERDICT r2 weak #6: `make lint` swallowed pyflakes findings (`|| true`),
letting an undefined-name bug (`Any` without an import, masked by
`from __future__ import annotations`) ship. These tests pin the new
behavior: injected problems are flagged (non-zero exit) and the repo
tree itself is clean.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_lint(*targets):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts/lint.py"), *map(str, targets)],
        capture_output=True, text=True, cwd=REPO)


def test_repo_tree_is_clean():
    r = run_lint()
    assert r.returncode == 0, r.stdout + r.stderr


def test_flags_injected_unused_import(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import os\n\nprint('hello')\n")
    r = run_lint(bad)
    assert r.returncode == 1
    assert "'os' imported but unused" in r.stdout


def test_flags_undefined_name_even_under_future_annotations(tmp_path):
    # the exact r2 bug shape: Any used only in an annotation, never
    # imported — runtime-silent under future annotations, still a bug
    bad = tmp_path / "bad2.py"
    bad.write_text(
        "from __future__ import annotations\n"
        "def f(x) -> Any:\n"
        "    return x\n")
    r = run_lint(bad)
    assert r.returncode == 1
    assert "undefined name 'Any'" in r.stdout


def test_clean_file_passes(tmp_path):
    good = tmp_path / "good.py"
    good.write_text(
        "import json\n\n"
        "def f(x):\n"
        "    return json.dumps(x)\n")
    r = run_lint(good)
    assert r.returncode == 0, r.stdout

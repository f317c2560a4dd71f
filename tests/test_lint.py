"""Lint gate, enforced inside the test run.

The reference ran pylint as part of its test command (reference
setup.cfg:4-6, ``addopts = ... --pylint``).  This repository enforces
the equivalent with the in-repo linter (tools/lint.py): the suite
fails if any source file regresses.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_repository_is_lint_clean():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lint.py")],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, "lint findings:\n" + proc.stdout


def test_linter_detects_violations(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import os\n"                          # F401 unused
        "x = " + "1 + " * 40 + "1\n"           # E501 long line
        "def f(a=[]):\n"                       # W0102 mutable default
        "    y = 2\n"                          # F841 unused local
        "    try:\n"
        "        pass\n"
        "    except:\n"                        # E722 bare except
        "        pass\n"
        "    return a\n")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import lint
        codes = {code for _, _, code, _ in lint.lint_file(str(bad))}
    finally:
        sys.path.pop(0)
    assert {"F401", "E501", "W0102", "F841", "E722"} <= codes

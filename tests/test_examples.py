"""Examples stay importable and the cheap ones run end-to-end.

The examples double as documentation (examples/README.md); this guards them
against API drift. The compute-heavy ones (01/02/04) are compile-checked
only — their code paths are the same session/serving/mesh APIs the rest of
the suite executes at identical scales.
"""

import pathlib
import py_compile
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


def test_examples_exist():
    assert len(EXAMPLES) >= 5


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path):
    py_compile.compile(str(path), doraise=True)


def test_transport_example_runs(tmp_path):
    """05_transport is pure host code (broker + pub/sub round trip) — run
    it for real. Skips itself cleanly when the native lib isn't built."""
    ex = next(p for p in EXAMPLES if p.name == "05_transport.py")
    proc = subprocess.run(
        [sys.executable, str(ex)], capture_output=True, text=True,
        timeout=120, cwd=str(ex.parent.parent),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert ("bit-exact round trip" in out) or ("not built" in out), out

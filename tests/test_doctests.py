"""Docstring examples are executable and exact — the reference's primary
spec mechanism (SURVEY.md §4.1: doctests with exact printed tensors,
/root/reference/lib/nx_signal.ex:545-579). The runner executes in a
subprocess with the USER-DEFAULT JAX config (CPU, x64 off) because the
printed dtypes in the examples are the ones a library user sees — the test
session itself runs with x64 forced on."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "doctest_runner.py")


def _run(*extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, RUNNER, *extra], env=env, capture_output=True,
        text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "DOCTESTS_OK" in res.stdout
    return int(res.stdout.split("DOCTESTS_OK")[1].split()[0])


def test_docstring_examples():
    # --fast skips the two compile-heavy modules (~200 s of shard_map
    # builds); the registry meta-test still enforces that EVERY export
    # carries an example, and test_docstring_examples_full executes the
    # heavy ones in the slow tier
    attempted = _run("--fast")
    # floor tracks the measured count (~1160 fast lines, 2026-08-21) with
    # slack for refactors — below this, whole modules went missing
    assert attempted >= 950, f"only {attempted} doctest lines ran"


@pytest.mark.slow
def test_docstring_examples_full():
    attempted = _run()
    assert attempted >= 1100, f"only {attempted} doctest lines ran"

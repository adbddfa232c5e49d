"""Docstring examples are executable and exact — the reference's primary
spec mechanism (SURVEY.md §4.1: doctests with exact printed tensors,
/root/reference/lib/nx_signal.ex:545-579). The runner executes in a
subprocess with the USER-DEFAULT JAX config (CPU, x64 off) because the
printed dtypes in the examples are the ones a library user sees — the test
session itself runs with x64 forced on."""

import os
import subprocess
import sys

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
    # the fast gate executes 100% of examples (round-5: the former
    # HEAVY_MODULES skip is gone — the worst offender, sharded_sosfilt's
    # deep-cascade example, was trimmed 43 s -> 16 s instead)
    attempted = _run()
    # floor tracks the measured count (~1330 lines, 2026-08-21) with
    # slack for refactors — below this, whole modules went missing
    assert attempted >= 1100, f"only {attempted} doctest lines ran"

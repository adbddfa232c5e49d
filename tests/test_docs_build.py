"""The docs build must stay warning-free (reference discipline: ex_doc
builds in CI, /root/reference/mix.exs:36-55)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_docs_build_clean(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_docs.py"),
         str(tmp_path / "html")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert res.stderr.strip() == "", res.stderr
    assert (tmp_path / "html" / "index.html").exists()
    assert (tmp_path / "html" / "guide_filtering.html").exists()

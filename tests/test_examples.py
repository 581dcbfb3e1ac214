"""The examples/ walkthrough scripts (the reference's exploratory-notebook analogs)
run end-to-end in their synthetic (no-weights) mode — each exercises the real code
path of its notebook counterpart (run_depth.ipynb, eval_depth.ipynb,
aesthetic_test.ipynb, video_process.ipynb)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = (f"import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import runpy, sys; sys.argv = ['{script}'] + {list(extra)!r}; "
            f"runpy.run_path('{os.path.join(REPO, 'examples', script)}', "
            f"run_name='__main__')")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc.stdout


def test_eval_depth_synthetic():
    out = _run("eval_depth.py", "--size", "64")
    assert "abs_rel" in out and "delta1" in out
    # affine pred aligns back onto gt: near-zero abs-rel, delta1 ~ 1
    import json

    m = json.loads(out[out.index("{"):])
    assert m["abs_rel"] < 0.1 and m["delta1"] > 0.95, m


def test_video_process_synthetic(tmp_path):
    out = _run("video_process.py")
    assert "windows" in out and "pixel_values" in out


def test_aesthetic_synthetic():
    out = _run("aesthetic_score.py")
    assert "mean aesthetic score" in out


@pytest.mark.slow
def test_run_depth_synthetic(tmp_path):
    out = _run("run_depth.py", "--out", str(tmp_path), "--steps", "2", "--size", "64")
    assert "finite=True" in out

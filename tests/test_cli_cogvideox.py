"""End-to-end CLI smoke: the CogVideoX serving CLI runs tensor-parallel over a mesh
(reference analog: CogVideo-main/tools/parallel_inference/parallel_inference_xdit.py,
which the reference drives via torchrun; here one process + GSPMD over a virtual mesh).

Runs the real `python -m lkgd_tpu.cli.run_inference_cogvideox` in a subprocess on an
8-device virtual CPU platform — exactly what the driver's multichip dryrun does — so it
covers arg parsing, mesh construction, weight sharding, and the sharded denoise+decode.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(tmp_path, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    out = os.path.join(tmp_path, "out.mp4")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from lkgd_tpu.cli.run_inference_cogvideox import main; main()")
    cmd = [sys.executable, "-c", code,
           "--tiny", "--generate-type", "t2v", "--height", "32", "--width", "32",
           "--num-frames", "9", "--num-inference-steps", "2", "--output", out,
           *extra]
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert os.path.exists(out)
    return proc.stdout


def test_cli_tensor_parallel_serving(tmp_path):
    """One subprocess covering the serving stack: TP weight sharding over the mesh
    plus the tiled + conv-cached-chunked VAE decode ladder."""
    stdout = _run_cli(str(tmp_path), "--mesh", "data=2,model=4",
                      "--vae-tiling", "--vae-tile-latent", "4", "4",
                      "--vae-chunk-frames", "1")
    assert "mesh: {'data': 2, 'model': 4}" in stdout
    assert "bytes/device" in stdout

"""CogVideoX trainer CLI smoke: LoRA mode and --full-finetune SFT mode (reference
CogVideo-main/finetune train.py sft/lora training_type) run real steps end-to-end in a
subprocess from a native tensor cache."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_cache(path):
    from lkgd_tpu.data.tensor_cache import TensorCache

    c = TensorCache(path)
    rng = np.random.default_rng(0)
    for i in range(2):
        c.put(f"clip{i}/latents", rng.normal(size=(3, 4, 4, 4)).astype(np.float32))
        c.put(f"clip{i}/image_latents", rng.normal(size=(4, 4, 4)).astype(np.float32))
        c.put(f"clip{i}/prompt_embeds", rng.normal(size=(8, 64)).astype(np.float32))
    c.close()


def _run(tmp_path, *extra):
    cache = os.path.join(tmp_path, "cache.lkgd")
    _make_cache(cache)
    out = os.path.join(tmp_path, "out")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from lkgd_tpu.cli.train_cogvideox_lora import main; main()")
    cmd = [sys.executable, "-c", code, "--cache", cache, "--output-dir", out,
           "--tiny", "--max-steps", "2", "--checkpoint-every", "2",
           "--batch-size", "1", *extra]
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    return proc.stdout


def test_full_finetune_sft(tmp_path):
    stdout = _run(str(tmp_path), "--full-finetune", "--remat")
    # SFT exports the whole transformer, not a handful of adapters
    n = int(stdout.strip().splitlines()[-1].split()[1])
    assert n > 50, n


def test_validation_and_report_to(tmp_path):
    """--validation-every renders latents with the current params mid-train (reference
    trainer validation loop) and --report-to tensorboard mirrors the JSONL metrics."""
    import glob

    _run(str(tmp_path), "--validation-every", "2", "--num-validation-steps", "2",
         "--report-to", "tensorboard")
    out = os.path.join(str(tmp_path), "out")
    lat = glob.glob(os.path.join(out, "validation", "step*_latents.npy"))
    assert lat, "validation latents not written"
    arr = np.load(lat[0])
    assert arr.ndim == 5 and np.isfinite(arr).all(), arr.shape
    assert glob.glob(os.path.join(out, "tb", "*", "events.*")), "no tb events"

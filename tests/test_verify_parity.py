"""End-to-end parity-harness test on a synthetic checkpoint with real diffusers key
naming: record reference outputs with ported weights, verify the check passes, then
corrupt one tensor and verify the report fails."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from lkgd_tpu.cli import verify_parity
from lkgd_tpu.models.unet_svd import UNetSpatioTemporalCondition
from lkgd_tpu.utils import porting


def _make_checkpoint(tmp_path, seed=0):
    from safetensors.numpy import save_file

    unet = UNetSpatioTemporalCondition(verify_parity._config_from_dict(verify_parity.TINY))
    params = unet.init(jax.random.PRNGKey(seed), jnp.ones((1, 2, 8, 8, 8)),
                       jnp.zeros((1,)), jnp.ones((1, 1, 64)), jnp.ones((1, 3)))
    rng = np.random.default_rng(seed)
    params = jax.tree.map(
        lambda x: (rng.standard_normal(x.shape) * 0.05).astype(np.float32), params)
    sd = porting.export_state_dict(params, key_map=porting.svd_export_key_map)
    path = os.path.join(tmp_path, "diffusion_pytorch_model.safetensors")
    save_file(sd, path)
    return path


def test_parity_harness_roundtrip(tmp_path):
    tmp = str(tmp_path)
    ckpt = _make_checkpoint(tmp)
    rec = os.path.join(tmp, "rec.npz")
    report = os.path.join(tmp, "report.json")

    rc = verify_parity.main(["record", "--out", rec, "--config", "tiny",
                             "--checkpoint", ckpt, "--batch", "1", "--frames", "2",
                             "--height", "32", "--width", "32"])
    assert rc == 0 and os.path.exists(rec)

    rc = verify_parity.main(["check", "--record", rec, "--checkpoint", ckpt,
                             "--report", report])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["pass"] and rep["max_abs_err"] < 1e-5

    # corrupt the output conv -> the report must fail (a mid-network corruption can be
    # attenuated below tolerance by the synthetic near-zero weights; the output layer
    # cannot hide)
    from safetensors.numpy import save_file

    sd = porting.load_safetensors(ckpt)
    k = "conv_out.weight"
    assert k in sd
    sd[k] = sd[k] + 0.05
    bad = os.path.join(tmp, "bad.safetensors")
    save_file(sd, bad)
    rc = verify_parity.main(["check", "--record", rec, "--checkpoint", bad,
                             "--report", report])
    assert rc == 1
    assert not json.load(open(report))["pass"]


def test_parity_harness_cogvideox_roundtrip(tmp_path):
    """The second model family through the same record/check loop: synthetic
    CogVideoX checkpoint in diffusers naming -> record -> check passes."""
    from safetensors.numpy import save_file

    from lkgd_tpu.models.cogvideox import CogVideoXConfig, CogVideoXTransformer3D

    tmp = str(tmp_path)
    cfg = CogVideoXConfig.tiny()
    model = CogVideoXTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 8, 8, cfg.in_channels)),
                        jnp.ones((1, cfg.max_text_seq_length, cfg.text_embed_dim)),
                        jnp.zeros((1,)),
                        domain_features=jnp.ones((1, 1, 48)),
                        flow_features=jnp.ones((1, 1, 48)))
    rng = np.random.default_rng(5)
    params = jax.tree.map(
        lambda x: (rng.standard_normal(np.shape(x)) * 0.05).astype(np.float32), params)
    sd = porting.export_state_dict(params, key_map=porting.cogvideox_export_key_map)
    ckpt = os.path.join(tmp, "diffusion_pytorch_model.safetensors")
    save_file(sd, ckpt)

    rec = os.path.join(tmp, "cog_rec.npz")
    report = os.path.join(tmp, "cog_report.json")
    rc = verify_parity.main(["record", "--model", "cogvideox", "--out", rec,
                             "--config", "tiny", "--checkpoint", ckpt,
                             "--batch", "1", "--frames", "2",
                             "--height", "64", "--width", "64"])
    assert rc == 0 and os.path.exists(rec)
    rc = verify_parity.main(["check", "--record", rec, "--checkpoint", ckpt,
                             "--report", report])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["pass"] and rep["max_abs_err"] < 1e-5


def test_parity_harness_pipeline_roundtrip(tmp_path):
    """svd_pipeline mode: the WHOLE assembled generate() loop (CLIP chain, noise-aug
    VAE encode, CFG-linspace Euler scan) recorded + re-checked through a diffusers-
    layout checkpoint root — the harness rung matching BASELINE.json's denoised-latent
    parity bar (r3 VERDICT item 10)."""
    from safetensors.numpy import save_file

    from lkgd_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection
    from lkgd_tpu.models.vae_temporal import AutoencoderKLTemporalDecoder, TemporalVAEConfig

    tmp = str(tmp_path)
    # build a diffusers-layout checkpoint root with synthetic weights in exact naming
    import argparse

    pipe = verify_parity._build_pipeline(
        argparse.Namespace(config="tiny", height=32, width=32, frames=2, steps=2),
        jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    params = jax.tree.map(
        lambda x: (rng.standard_normal(x.shape) * 0.08).astype(np.float32), params)
    os.makedirs(os.path.join(tmp, "unet"))
    os.makedirs(os.path.join(tmp, "vae"))
    os.makedirs(os.path.join(tmp, "image_encoder"))
    save_file(porting.export_state_dict(params["unet"],
                                        key_map=porting.svd_export_key_map),
              os.path.join(tmp, "unet", "diffusion_pytorch_model.safetensors"))
    save_file(porting.export_state_dict(params["vae"],
                                        key_map=porting.vae_export_key_map),
              os.path.join(tmp, "vae", "diffusion_pytorch_model.safetensors"))
    save_file(porting.export_state_dict(params["image_encoder"],
                                        key_map=porting.clip_export_key_map),
              os.path.join(tmp, "image_encoder", "model.safetensors"))

    rec = os.path.join(tmp, "rec.npz")
    report = os.path.join(tmp, "report.json")
    rc = verify_parity.main(["record", "--model", "svd_pipeline", "--out", rec,
                             "--checkpoint", tmp, "--batch", "1", "--frames", "2",
                             "--height", "32", "--width", "32", "--steps", "2"])
    assert rc == 0 and os.path.exists(rec)

    rc = verify_parity.main(["check", "--record", rec, "--checkpoint", tmp,
                             "--report", report])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["mode"] == "pipeline" and rep["pass"]

    # corrupting the VAE's quant_conv must fail the whole-loop check (the cond-latent
    # path feeds every denoise step)
    vp = os.path.join(tmp, "vae", "diffusion_pytorch_model.safetensors")
    sd = porting.load_safetensors(vp)
    sd["quant_conv.weight"] = sd["quant_conv.weight"] + 0.5
    save_file(sd, vp)
    rc = verify_parity.main(["check", "--record", rec, "--checkpoint", tmp])
    assert rc == 1

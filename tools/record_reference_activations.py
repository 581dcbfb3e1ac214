"""Record reference (PyTorch/diffusers) SVD-UNet activations for the parity check.

Run this in a torch+diffusers environment that can load the reference checkpoints
(the environment the reference repo itself runs in — diffusers==0.27.2 per its
requirements.txt). It captures one denoise-step forward of the reference
``UNetSpatioTemporalConditionModel`` on fixed random inputs and writes the ``.npz``
record that ``lkgd_tpu.cli.verify_parity check`` consumes:

    # reference-side (CUDA box):
    python tools/record_reference_activations.py \
        --checkpoint /ckpts/stable-video-diffusion-img2vid-xt \
        --out svd_xt_record.npz [--lkgd /ckpts/lkgd_finetune/model.safetensors]

    # our side (this repo):
    python -m lkgd_tpu.cli.verify_parity check --record svd_xt_record.npz \
        --checkpoint /ckpts/stable-video-diffusion-img2vid-xt \
        --report parity.json --rtol 1e-4 --atol 1e-4

Keys written (the contract documented at lkgd_tpu/cli/verify_parity.py:5-11):
  sample (B, T, H/8, W/8, C_in) channels-last, timestep (B,),
  encoder_hidden_states (B, 1, D), added_time_ids (B, 3), output (same layout as
  sample but C_out), config (json of the UNet architecture fields).

The reference loads these models via ``from_pretrained`` (e.g.
`/root/reference/run_models/run_inference_trans_svd.py`, `utils/util.py:531-608`); this
script is deliberately dependency-light: torch + diffusers + numpy only.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="HF checkpoint dir (repo root or its unet/ subdir)")
    p.add_argument("--lkgd", help="optional LKGD fine-tune model.safetensors to overlay "
                                  "(quaternion fusion weights, reference "
                                  "utils/util.py:585-593)")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sigma", type=float, default=7.0,
                   help="EDM sigma; timestep = 0.25*log(sigma) (SVD v-pred convention)")
    args = p.parse_args()

    import torch
    from diffusers import UNetSpatioTemporalConditionModel

    unet = UNetSpatioTemporalConditionModel.from_pretrained(
        args.checkpoint, subfolder=None if args.checkpoint.rstrip("/").endswith("unet")
        else "unet", torch_dtype=torch.float32)
    unet.eval()

    if args.lkgd:
        # overlay the LKGD-trained extras exactly as the reference does
        # (utils/util.py:585-593: strict=False state-dict load of model.safetensors)
        from safetensors.torch import load_file

        extra = load_file(args.lkgd)
        missing, unexpected = unet.load_state_dict(extra, strict=False)
        print(f"overlaid {len(extra)} tensors ({len(unexpected)} unexpected)")

    cfg = unet.config
    rng = np.random.default_rng(args.seed)
    b, t = args.batch, args.frames
    h, w = args.height // 8, args.width // 8
    sample = rng.standard_normal((b, t, cfg.in_channels, h, w)).astype(np.float32)
    timestep = np.full((b,), 0.25 * np.log(args.sigma), np.float32)
    ehs = rng.standard_normal((b, 1, cfg.cross_attention_dim)).astype(np.float32)
    add_ids = np.asarray([[6.0, 127.0, 0.02]] * b, np.float32)

    with torch.no_grad():
        out = unet(
            torch.from_numpy(sample), torch.from_numpy(timestep),
            encoder_hidden_states=torch.from_numpy(ehs),
            added_time_ids=torch.from_numpy(add_ids),
            return_dict=False)[0].numpy()

    np.savez_compressed(
        args.out,
        # channels-last layouts (what verify_parity feeds our UNet)
        sample=sample.transpose(0, 1, 3, 4, 2),
        timestep=timestep,
        encoder_hidden_states=ehs,
        added_time_ids=add_ids,
        output=out.transpose(0, 1, 3, 4, 2),
        config=json.dumps({
            "in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
            "layers_per_block": cfg.layers_per_block,
            "cross_attention_dim": cfg.cross_attention_dim,
            "num_frames": t,
            "block_out_channels": list(cfg.block_out_channels),
            "down_block_types": list(cfg.down_block_types),
            "up_block_types": list(cfg.up_block_types),
            "num_attention_heads": list(cfg.num_attention_heads),
        }))
    print(f"recorded {out.shape} -> {args.out}")


if __name__ == "__main__":
    main()

"""Image/video captioning CLI — the reference's pseudo-caption tooling.

Covers ``blip_cap`` (`/root/reference/utils/util.py:310-329`: BLIP captions used as
inversion prompts / dataset captions) and stands in for the CogVideo caption pipeline
(`CogVideo-main/tools/caption/` drives a VLM over video frames the same way: sample
frames -> caption -> write JSON). Weights are external (egress-gated); pass the HF
``BlipForConditionalGeneration`` state dict via --weights.

  python -m lkgd_tpu.cli.caption --input data/videos --weights blip_large.npz \\
      --output captions.json [--tokenizer /path/to/tokenizer_dir]

Without a tokenizer dir the raw token ids are written (decode offline); with one,
captions are decoded text.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--weights", required=True,
                   help="BLIP state dict (.safetensors/.npz/torch .bin)")
    p.add_argument("--model-size", default="large", choices=("base", "large"))
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (BertTokenizer files) for text decoding")
    p.add_argument("--max-length", type=int, default=20)
    p.add_argument("--frame", type=int, default=0,
                   help="which frame of each video to caption")
    args = p.parse_args()

    import jax.numpy as jnp

    from lkgd_tpu.data.video_io import load_input
    from lkgd_tpu.models.blip import (
        BlipCaptioner, BlipConfig, greedy_caption, port_blip, preprocess_images)
    from lkgd_tpu.models.depth_anything import load_state_dict

    cfg = BlipConfig.large() if args.model_size == "large" else BlipConfig.base()
    params = port_blip(load_state_dict(args.weights), cfg)
    model = BlipCaptioner(cfg)

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    files = sorted(sum([glob.glob(os.path.join(args.input, e))
                        for e in ("*.mp4", "*.gif", "*.png", "*.jpg")], []))
    results = {}
    for f in files:
        frames = load_input(f, max_frames=args.frame + 1)
        img = frames[min(args.frame, len(frames) - 1)]
        pixels = preprocess_images(img[None], cfg.image_size)
        ids = greedy_caption(model, params, jnp.asarray(pixels),
                             max_length=args.max_length)[0]
        ids = [int(t) for t in ids if t != cfg.pad_token_id][1:]  # strip BOS/pad
        if cfg.sep_token_id in ids:
            ids = ids[: ids.index(cfg.sep_token_id)]
        results[os.path.basename(f)] = (
            tokenizer.decode(ids, skip_special_tokens=True) if tokenizer else ids)
        print(f"{f}: {results[os.path.basename(f)]}")

    with open(args.output, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {len(results)} captions -> {args.output}")


if __name__ == "__main__":
    main()

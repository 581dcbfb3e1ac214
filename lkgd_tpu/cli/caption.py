"""Image/video captioning CLI — the reference's pseudo-caption tooling.

Two backends:
  * ``--model blip`` — ``blip_cap`` (`/root/reference/utils/util.py:310-329`: BLIP
    captions used as inversion prompts / dataset captions)
  * ``--model cogvlm`` — the CogVideoX caption pipeline
    (`/root/reference/CogVideo-main/tools/caption/video_caption.py`: CogVLM2-Caption
    over sampled video frames, greedy decode)

Weights are external (egress-gated); pass the HF state dict via --weights.

  python -m lkgd_tpu.cli.caption --input data/videos --weights blip_large.npz \\
      --output captions.json [--tokenizer /path/to/tokenizer_dir]

Without a tokenizer dir the raw token ids are written (decode offline); with one,
captions are decoded text. CogVLM additionally needs --tokenizer (LLaMA3 BPE) or a
pre-tokenized --prompt-ids file for the query prompt.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _files(input_dir):
    return sorted(sum([glob.glob(os.path.join(input_dir, e))
                       for e in ("*.mp4", "*.gif", "*.png", "*.jpg")], []))


def _run_blip(args, files, tokenizer):
    import jax.numpy as jnp

    from lkgd_tpu.data.video_io import load_input
    from lkgd_tpu.models.blip import (
        BlipCaptioner, BlipConfig, greedy_caption, port_blip, preprocess_images)
    from lkgd_tpu.utils.porting import load_state_dict

    cfg = BlipConfig.large() if args.model_size == "large" else BlipConfig.base()
    params = port_blip(load_state_dict(args.weights), cfg)
    model = BlipCaptioner(cfg)

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
    return results


def _run_cogvlm(args, files, tokenizer):
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.data.video_io import load_input
    from lkgd_tpu.models.cogvlm import (
        CogVLMConfig, CogVLMVideoCaptioner, greedy_video_caption, port_cogvlm)
    from lkgd_tpu.utils.porting import load_state_dict

    cfg = CogVLMConfig.caption_8b()
    model = CogVLMVideoCaptioner(cfg, dtype=jnp.bfloat16)
    frames0 = jnp.zeros((1, 1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), frames0, jnp.zeros((1, 4), jnp.int32)))
    params = port_cogvlm(load_state_dict(args.weights), shapes)

    if args.prompt_ids:
        prompt = np.asarray(json.load(open(args.prompt_ids)), np.int32)[None]
    elif tokenizer is not None:
        prompt = np.asarray(tokenizer.encode(args.prompt), np.int32)[None]
    else:
        raise SystemExit("cogvlm needs --tokenizer or --prompt-ids")

    # CLIP-style normalization (video_caption.py transforms)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    results = {}
    for f in files:
        # uniform temporal sampling across the whole video (video_caption.py spans the
        # clip duration; load_input already returns float32 frames in [0, 1])
        frames = load_input(f)
        idx = np.linspace(0, len(frames) - 1, min(args.num_frames, len(frames)))
        frames = [frames[int(round(i))] for i in idx]
        import jax.image

        clip = np.stack([np.asarray(jax.image.resize(
            jnp.asarray(fr, jnp.float32),
            (cfg.image_size, cfg.image_size, 3), "bilinear")) for fr in frames])
        clip = (clip - mean) / std
        ids = greedy_video_caption(model, params, jnp.asarray(clip[None]), prompt,
                                   max_new_tokens=args.max_length)[0]
        ids = [int(t) for t in ids if t not in (cfg.pad_token_id, cfg.eos_token_id)]
        results[os.path.basename(f)] = (
            tokenizer.decode(ids, skip_special_tokens=True) if tokenizer else ids)
        print(f"{f}: {results[os.path.basename(f)]}")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--weights", required=True,
                   help="model state dict (.safetensors/.npz/torch .bin)")
    p.add_argument("--model", default="blip", choices=("blip", "cogvlm"))
    p.add_argument("--model-size", default="large", choices=("base", "large"))
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir (BERT for blip, LLaMA3 for cogvlm)")
    p.add_argument("--max-length", type=int, default=20)
    p.add_argument("--frame", type=int, default=0,
                   help="blip: which frame of each video to caption")
    p.add_argument("--num-frames", type=int, default=24,
                   help="cogvlm: frames sampled per video (video_caption.py num_frames)")
    p.add_argument("--prompt", default="Please describe this video in detail.")
    p.add_argument("--prompt-ids", default=None,
                   help="JSON list of pre-tokenized prompt ids (no tokenizer needed)")
    args = p.parse_args()

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    files = _files(args.input)
    if args.model == "blip":
        results = _run_blip(args, files, tokenizer)
    else:
        results = _run_cogvlm(args, files, tokenizer)

    with open(args.output, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {len(results)} captions -> {args.output}")


if __name__ == "__main__":
    main()

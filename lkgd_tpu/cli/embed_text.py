"""Text -> T5 prompt embeddings (.npy) for the CogVideoX CLIs.

The reference encodes prompts inline on every run (`CogVideo-main/inference/
cli_demo.py` loads the full T5-XXL next to the DiT). On a 16 GB chip the XXL encoder
(~4.7 GB bf16) competes with the 11 GB transformer, so the TPU-native flow precomputes
embeddings once (`run_inference_cogvideox.py --prompt-embeds out.npy`), freeing the
serving HBM. Uses the native T5 v1.1 encoder (`models/t5_text.py`, HF-parity tested).

  python -m lkgd_tpu.cli.embed_text --t5 /ckpts/t5-v1_1-xxl \
      --prompt "a girl riding a horse on the beach" --output prompt.npy
  python -m lkgd_tpu.cli.embed_text --t5 ... --prompts-file prompts.txt --output dir/

``--tiny`` runs a random-init tiny T5 (no weights, smoke/testing: proves the
tokenizer-free path shape-end-to-end with a whitespace hash tokenizer).
"""

from __future__ import annotations

import argparse
import os


def _tiny_encode(prompts, max_length: int):
    """Dependency-free smoke path: hash-bucket 'tokenizer' + random-init tiny T5."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lkgd_tpu.models.t5_text import T5Config, T5Encoder

    cfg = T5Config.tiny()
    model = T5Encoder(cfg)
    ids = np.zeros((len(prompts), max_length), np.int32)
    mask = np.zeros((len(prompts), max_length), np.int32)
    for i, text in enumerate(prompts):
        toks = [hash(w) % cfg.vocab_size for w in text.split()][:max_length]
        ids[i, :len(toks)] = toks
        mask[i, :len(toks)] = 1
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    return np.asarray(out, np.float32)


def main():
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--t5", help="T5 checkpoint dir (tokenizer + safetensors/bin)")
    p.add_argument("--prompt", action="append", default=[],
                   help="prompt text (repeatable)")
    p.add_argument("--prompts-file", help="one prompt per line")
    p.add_argument("--output", required=True,
                   help=".npy path (single batch) or directory (one file per prompt)")
    p.add_argument("--max-length", type=int, default=226)
    p.add_argument("--tiny", action="store_true", help="random-init tiny T5 (smoke)")
    args = p.parse_args()

    prompts = list(args.prompt)
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts += [line.strip() for line in f if line.strip()]
    if not prompts:
        p.error("no prompts given (--prompt / --prompts-file)")

    if args.tiny:
        emb = _tiny_encode(prompts, min(args.max_length, 8))
    else:
        if not args.t5:
            p.error("--t5 checkpoint dir required (or use --tiny)")
        from lkgd_tpu.models.t5_text import T5TextEncoder

        enc = T5TextEncoder(args.t5, max_length=args.max_length)
        emb = enc.encode(prompts)

    if args.output.endswith(".npy"):
        np.save(args.output, emb)
        print(f"wrote {args.output}: {emb.shape}")
    else:
        os.makedirs(args.output, exist_ok=True)
        for i, (text, e) in enumerate(zip(prompts, emb)):
            path = os.path.join(args.output, f"prompt_{i:04d}.npy")
            np.save(path, e[None])
            print(f"wrote {path}: {e[None].shape}  # {text[:50]}")


if __name__ == "__main__":
    main()

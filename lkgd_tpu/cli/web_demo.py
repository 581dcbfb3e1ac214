"""Dependency-free web demo — the `gradios/gradio_svd_trans*.py` analog on stdlib only.

The reference serves its interactive demos through Gradio
(`/root/reference/gradios/gradio_svd_trans_simple.py:18-44`: start/end frame uploads,
seed/motion-bucket/fps controls, video output). Gradio is not in the TPU image, so this
module implements the same surface on ``http.server``: one HTML page whose JS posts
base64-encoded frames as JSON, and a ``/generate`` endpoint that runs the pipeline and
streams back an mp4. ``cli/gradio_demo.py`` prefers Gradio when installed and falls back
here, so the demo component works in every environment.

  python -m lkgd_tpu.cli.web_demo --weights ckpts/ [--mode trans] [--port 7860]

The server core is pipeline-agnostic (``serve`` takes any ``generate_fn``), which is how
the tests drive it without model weights.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>LKGD-TPU {mode}</title><style>
body {{ font-family: sans-serif; max-width: 640px; margin: 2em auto; }}
label {{ display: block; margin-top: 1em; }}
video {{ width: 100%; margin-top: 1em; }}
#status {{ color: #666; }}
</style></head><body>
<h2>LKGD-TPU &mdash; {mode} pipeline</h2>
<label>start frame <input type="file" id="start" accept="image/*"></label>
<label class="trans-only">end frame <input type="file" id="end" accept="image/*"></label>
<label>seed <input type="number" id="seed" value="23123134"></label>
<label>motion bucket <input type="range" id="motion" min="1" max="255" value="127"></label>
<label>fps <input type="range" id="fps" min="1" max="30" value="7"></label>
<button id="go">generate</button> <span id="status"></span>
<video id="out" controls></video>
<script>
const b64 = f => new Promise((res, rej) => {{
  if (!f) return res(null);
  const r = new FileReader();
  r.onload = () => res(r.result.split(',')[1]);
  r.onerror = rej; r.readAsDataURL(f);
}});
if ("{mode}" !== "trans")
  document.querySelectorAll(".trans-only").forEach(e => e.style.display = "none");
document.getElementById('go').onclick = async () => {{
  const status = document.getElementById('status');
  status.textContent = 'generating…';
  const body = {{
    start: await b64(document.getElementById('start').files[0]),
    end: await b64(document.getElementById('end').files[0]),
    seed: +document.getElementById('seed').value,
    motion_bucket_id: +document.getElementById('motion').value,
    fps: +document.getElementById('fps').value,
  }};
  const r = await fetch('/generate', {{method: 'POST', body: JSON.stringify(body)}});
  if (!r.ok) {{ status.textContent = 'error: ' + await r.text(); return; }}
  document.getElementById('out').src = URL.createObjectURL(await r.blob());
  status.textContent = 'done';
}};
</script></body></html>
"""


def _decode_image(b64_data: str) -> np.ndarray:
    """base64 image file -> (H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64_data))).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def make_handler(generate_fn: Callable, mode: str):
    """``generate_fn(start, end, seed, motion_bucket_id, fps) -> (T, H, W, 3) uint8``;
    ``start``/``end`` are (H, W, 3) float32 in [0, 1] (``end`` is None outside trans)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # tests and servers stay quiet
            pass

        def do_GET(self):
            if self.path not in ("/", "/index.html"):
                self.send_error(404)
                return
            page = _PAGE.format(mode=mode).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(page)))
            self.end_headers()
            self.wfile.write(page)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                start = _decode_image(req["start"])
                end = _decode_image(req["end"]) if req.get("end") else None
                video = generate_fn(start, end, int(req.get("seed", 23123134)),
                                    int(req.get("motion_bucket_id", 127)),
                                    int(req.get("fps", 7)))
            except Exception as e:  # surface pipeline errors to the page
                msg = str(e).encode()
                self.send_response(500)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            from lkgd_tpu.data.video_io import write_video

            with tempfile.TemporaryDirectory() as td:
                path = os.path.join(td, "out.mp4")
                write_video(path, np.asarray(video), fps=int(req.get("fps", 7)))
                with open(path, "rb") as f:
                    data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return Handler


def serve(generate_fn: Callable, mode: str = "base", port: int = 7860) -> None:
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(generate_fn, mode))
    print(f"serving LKGD-TPU {mode} demo on http://0.0.0.0:{port}")
    httpd.serve_forever()


def build_generate_fn(pipe, params, mode: str) -> Callable:
    """The pipeline adapter shared with the Gradio front-end."""
    import jax

    from lkgd_tpu.data.video_io import process_frames

    def generate(start, end, seed, motion_bucket_id, fps):
        img = process_frames(start[None], pipe.config.height, pipe.config.width)[0]
        rng = jax.random.PRNGKey(seed)
        if mode == "trans" and end is not None:
            eimg = process_frames(end[None], pipe.config.height, pipe.config.width)[0]
            video = pipe(params, img, eimg, rng=rng)[0]
        else:
            video = pipe(params, img[None], rng=rng)[0]
        return (np.clip(np.asarray(video), 0.0, 1.0) * 255).astype(np.uint8)

    return generate


def build_cogvideox_generate_fn(args) -> Callable:
    """CogVideoX I2V behind the same demo surface (the reference
    `CogVideo-main/gradio_composite_demo` analog): start frame -> video; the
    motion-bucket control is SVD-specific and ignored. Text conditioning comes from
    --prompt-embeds (precomputed T5) or zeros."""
    import jax
    import jax.numpy as jnp

    from lkgd_tpu.data.video_io import process_frames
    from lkgd_tpu.models.cogvideox import CogVideoXConfig
    from lkgd_tpu.models.vae_cogvideox import AutoencoderKLCogVideoX, CogVideoXVAEConfig
    from lkgd_tpu.pipelines.cogvideox_i2v import (CogVideoXImageToVideoPipeline,
                                                  CogVideoXPipelineConfig)

    tcfg = CogVideoXConfig.tiny() if args.tiny else CogVideoXConfig.cogvideox_5b_i2v()
    vcfg = CogVideoXVAEConfig.tiny() if args.tiny else CogVideoXVAEConfig()
    pcfg = CogVideoXPipelineConfig(
        height=args.height, width=args.width, num_frames=args.num_frames,
        vae_scale_factor_spatial=2 ** (len(vcfg.block_out_channels) - 1))
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    pipe = CogVideoXImageToVideoPipeline(config=pcfg, transformer_config=tcfg, dtype=dtype)
    vae = AutoencoderKLCogVideoX(vcfg, dtype=dtype)
    params = jax.jit(pipe.init_params)(jax.random.PRNGKey(0))
    vae_params = vae.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 1, args.height, args.width, 3)))
    if args.weights:
        from lkgd_tpu.utils import porting

        t_path = os.path.join(args.weights, "transformer.safetensors")
        if os.path.exists(t_path):
            params["transformer"] = porting.port_cogvideox(
                porting.load_safetensors(t_path), params["transformer"], strict=False)
        v_path = os.path.join(args.weights, "vae_3d.safetensors")
        if os.path.exists(v_path):
            vae_params = porting.port_state_dict(
                porting.load_safetensors(v_path), vae_params, strict=False)
    if getattr(args, "prompt_embeds", None):
        emb = np.load(args.prompt_embeds)
        prompt_embeds = jnp.asarray(emb if emb.ndim == 3 else emb[None])
    else:
        prompt_embeds = jnp.zeros((1, tcfg.max_text_seq_length, tcfg.text_embed_dim))

    @jax.jit
    def encode(vp, img):
        lat = vae.apply(vp, img, method=AutoencoderKLCogVideoX.encode_mode)
        return lat[:, 0] * vcfg.scaling_factor

    @jax.jit
    def decode(vp, z):
        frames = vae.apply(vp, z / vcfg.scaling_factor,
                           method=AutoencoderKLCogVideoX.decode)
        return jnp.clip(frames.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def generate(start, end, seed, motion_bucket_id, fps):
        del end, motion_bucket_id  # SVD-specific controls
        img = process_frames(start[None], args.height, args.width)[0]
        image_latents = encode(vae_params, jnp.asarray(img[None, None]) * 2.0 - 1.0)
        latents = pipe(params, prompt_embeds, image_latents,
                       rng=jax.random.PRNGKey(seed))
        video = np.asarray(decode(vae_params, jnp.asarray(latents)))[0]
        return (np.clip(video, 0.0, 1.0) * 255).astype(np.uint8)

    return generate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["base", "trans", "cogvideox"], default="base")
    p.add_argument("--weights")
    p.add_argument("--prompt-embeds", help="cogvideox: .npy T5 embeddings")
    p.add_argument("--tiny", action="store_true", help="cogvideox: tiny smoke config")
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    if args.mode == "cogvideox":
        serve(build_cogvideox_generate_fn(args), args.mode, args.port)
        return

    from lkgd_tpu.cli.gradio_demo import build_cli_config
    from lkgd_tpu.cli.run_inference_svd import build_pipeline, load_params

    cfg = build_cli_config(args)
    pipe = build_pipeline(cfg)
    params = load_params(pipe, cfg)
    serve(build_generate_fn(pipe, params, args.mode), args.mode, args.port)


if __name__ == "__main__":
    main()

"""The stdlib web demo (gradio-free fallback for the reference's gradios/ UIs) must
serve the page and run a round trip: POST base64 frames -> pipeline -> mp4 bytes."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from lkgd_tpu.cli import web_demo


def _png_b64(h=8, w=8):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture
def server():
    calls = {}

    def generate(start, end, seed, motion_bucket_id, fps):
        calls.update(start=start, end=end, seed=seed, motion=motion_bucket_id, fps=fps)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), web_demo.make_handler(generate, "trans"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1], calls
    httpd.shutdown()


def test_page_served(server):
    port, _ = server
    html = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read().decode()
    assert "trans pipeline" in html and "/generate" in html


def test_generate_round_trip(server):
    port, calls = server
    body = json.dumps({"start": _png_b64(), "end": _png_b64(), "seed": 7,
                       "motion_bucket_id": 42, "fps": 9}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/generate", data=body)
    data = urllib.request.urlopen(req).read()
    assert data[4:8] == b"ftyp"  # mp4 container magic
    assert calls["seed"] == 7 and calls["motion"] == 42 and calls["fps"] == 9
    assert calls["start"].shape == (8, 8, 3) and calls["start"].dtype == np.float32
    assert calls["end"] is not None and 0.0 <= calls["start"].max() <= 1.0


def test_generate_error_surfaces(server):
    port, _ = server
    req = urllib.request.Request(f"http://127.0.0.1:{port}/generate",
                                 data=json.dumps({"start": None}).encode())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 500


@pytest.mark.slow
def test_cogvideox_generate_fn_tiny():
    """The CogVideoX demo adapter (composite-demo analog) produces a uint8 video from a
    start frame on the tiny config end to end."""
    import argparse

    args = argparse.Namespace(tiny=True, weights=None, prompt_embeds=None,
                              height=32, width=32, num_frames=9)
    gen = web_demo.build_cogvideox_generate_fn(args)
    start = np.random.default_rng(3).uniform(size=(40, 40, 3)).astype(np.float32)
    video = gen(start, None, seed=5, motion_bucket_id=127, fps=8)
    assert video.shape == (9, 32, 32, 3) and video.dtype == np.uint8

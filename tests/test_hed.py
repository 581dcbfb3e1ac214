"""HED soft-edge annotator vs an independent torch transcription of
ControlNetHED_Apache2 (reference preprocessor `utils/controlnet_utils.py:110-117`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lkgd_tpu.models.hed import ControlNetHED, hed_edge, port_hed, safe_step


def _torch_oracle(sd, x_nchw):
    """Plain-torch HED forward (VGG tower + 1x1 side projections)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = {k: torch.tensor(v) for k, v in sd.items()}
    h = torch.tensor(x_nchw) - t["norm"]
    projections = []
    for b, (n, down) in enumerate([(2, False), (2, True), (3, True), (3, True),
                                   (3, True)], start=1):
        if down:
            h = F.max_pool2d(h, 2, 2)
        for i in range(n):
            h = F.relu(F.conv2d(h, t[f"block{b}.convs.{i}.weight"],
                                t[f"block{b}.convs.{i}.bias"], padding=1))
        projections.append(F.conv2d(h, t[f"block{b}.projection.weight"],
                                    t[f"block{b}.projection.bias"]))
    return projections


def _random_sd(rng):
    sd = {"norm": rng.normal(size=(1, 3, 1, 1)).astype(np.float32)}
    chans = [(3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3)]
    for b, (cin, cout, n) in enumerate(chans, start=1):
        for i in range(n):
            ci = cin if i == 0 else cout
            sd[f"block{b}.convs.{i}.weight"] = (
                rng.normal(size=(cout, ci, 3, 3)).astype(np.float32) * 0.05)
            sd[f"block{b}.convs.{i}.bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.05
        sd[f"block{b}.projection.weight"] = (
            rng.normal(size=(1, cout, 1, 1)).astype(np.float32) * 0.05)
        sd[f"block{b}.projection.bias"] = rng.normal(size=(1,)).astype(np.float32)
    return sd


class TestHED:
    def test_matches_torch_oracle(self):
        pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        sd = _random_sd(rng)
        model = ControlNetHED()
        x = rng.uniform(size=(1, 32, 48, 3)).astype(np.float32) * 255.0

        template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 48, 3)))
        params = port_hed(sd, template)
        got = model.apply(params, jnp.asarray(x))

        want = _torch_oracle(sd, x.transpose(0, 3, 1, 2))
        assert len(got) == 5
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g)[..., 0], w.numpy()[:, 0],
                                       rtol=1e-4, atol=1e-4)

    def test_edge_map_range_and_shape(self):
        model = ControlNetHED()
        x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 32, 32, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x * 255.0)
        edge = hed_edge(model, params, x)
        assert edge.shape == (1, 32, 32)
        assert float(edge.min()) >= 0.0 and float(edge.max()) <= 1.0

    def test_safe_step(self):
        x = jnp.asarray([0.0, 0.3, 0.5, 0.9, 1.0])
        y = np.asarray(safe_step(x))
        assert set(np.round(y * 2).astype(int)) <= {0, 1, 2, 3}

    def test_param_count(self):
        """VGG16-conv tower + 5 side projections: pinned so a porter regression that
        drops/renames a stage fails loudly."""
        model = ControlNetHED()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        n = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
        assert n == 14_716_168, n

    def test_scribble_postprocess_binary_lines(self):
        """controlnet_aux HEDdetector(scribble=True) parity shape: nms + blur +
        threshold must produce a BINARY line mask (not a soft/quantized map) that
        follows the edge ridge and is zero in flat regions."""
        from lkgd_tpu.models.hed import scribble_postprocess

        h = w = 64
        yy = np.arange(h, dtype=np.float32)[:, None]
        # soft horizontal ridge at row 32 (sigma-4 gaussian profile), like a blurry edge
        edge = np.exp(-((yy - 32.0) ** 2) / (2 * 4.0 ** 2)) * np.ones((1, w), np.float32)
        out = scribble_postprocess(edge)
        assert out.shape == (h, w)
        assert set(np.unique(out)) <= {0.0, 1.0}, "scribble output must be binary"
        assert out[30:35].mean() > 0.9, "ridge rows should be marked"
        assert out[:20].sum() == 0 and out[-20:].sum() == 0, "flat regions must stay 0"

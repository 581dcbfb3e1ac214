"""I3D (Inflated 3D Inception, Kinetics-400) — the FVD feature network, eval-only JAX.

FVD — the headline video metric the reference evaluates against (BASELINE parity
metrics; reference metric harness `/root/reference/gradios/compute_metrics.py`) — is the
Frechet distance between I3D embeddings of real and generated clips. This re-implements
the standard InceptionI3d (TF-hub ``i3d-kinetics-400`` / piergiaj pytorch-i3d): Unit3D =
bias-free Conv3D + eval BatchNorm(eps=1e-3) + relu with TF SAME padding, nine Inception
modules, and the 400-way logits head. :func:`i3d_features` returns the pre-softmax
logits averaged over time — the feature convention of the original FVD implementation.

Param keys mirror the pytorch-i3d ``state_dict`` so :func:`port_torch_state_dict` is a
mechanical re-keying (conv kernels OIDHW -> DHWIO). Videos are (B, T, H, W, 3) in
[0, 1]; :func:`preprocess` rescales to the [-1, 1] the network was trained on. T must be
>= 9 for the temporal pools to stay non-degenerate (FVD uses 16-frame clips at 224x224).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3

# InceptionModule output channels: (b0, b1a, b1b, b2a, b2b, b3b)
_MODULES = {
    "Mixed_3b": (192, (64, 96, 128, 16, 32, 32)),
    "Mixed_3c": (256, (128, 128, 192, 32, 96, 64)),
    "Mixed_4b": (480, (192, 96, 208, 16, 48, 64)),
    "Mixed_4c": (512, (160, 112, 224, 24, 64, 64)),
    "Mixed_4d": (512, (128, 128, 256, 24, 64, 64)),
    "Mixed_4e": (512, (112, 144, 288, 32, 64, 64)),
    "Mixed_4f": (528, (256, 160, 320, 32, 128, 128)),
    "Mixed_5b": (832, (256, 160, 320, 32, 128, 128)),
    "Mixed_5c": (832, (384, 192, 384, 48, 128, 128)),
}
_STEM = {  # name -> (kernel (t,h,w), in, out)
    "Conv3d_1a_7x7": ((7, 7, 7), 3, 64),
    "Conv3d_2b_1x1": ((1, 1, 1), 64, 64),
    "Conv3d_2c_3x3": ((3, 3, 3), 64, 192),
}
NUM_CLASSES = 400


def _unit3d(p: dict, x: jnp.ndarray, stride=(1, 1, 1), relu: bool = True) -> jnp.ndarray:
    """Conv3D (SAME, bias-free) + eval BatchNorm + relu — pytorch-i3d ``Unit3D``."""
    y = jax.lax.conv_general_dilated(
        x, p["conv3d"]["kernel"].astype(x.dtype), window_strides=stride, padding="SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + BN_EPS)
    scale = (bn["weight"] * inv).astype(y.dtype)
    bias = (bn["bias"] - bn["mean"] * bn["weight"] * inv).astype(y.dtype)
    y = y * scale + bias
    return jax.nn.relu(y) if relu else y


def _max_pool3d(x: jnp.ndarray, window, stride) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1,) + tuple(window) + (1,),
        (1,) + tuple(stride) + (1,), "SAME")


def _inception(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    b0 = _unit3d(p["b0"], x)
    b1 = _unit3d(p["b1b"], _unit3d(p["b1a"], x))
    b2 = _unit3d(p["b2b"], _unit3d(p["b2a"], x))
    b3 = _unit3d(p["b3b"], _max_pool3d(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def preprocess(videos: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) in [0, 1] -> [-1, 1] (resize to 224 upstream if needed)."""
    return videos.astype(jnp.float32) * 2.0 - 1.0


def i3d_features(params: dict, videos: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) videos in [0, 1] -> FVD features (B, 400): time-averaged
    pre-softmax Kinetics logits."""
    x = preprocess(videos)
    x = _unit3d(params["Conv3d_1a_7x7"], x, stride=(2, 2, 2))
    x = _max_pool3d(x, (1, 3, 3), (1, 2, 2))
    x = _unit3d(params["Conv3d_2b_1x1"], x)
    x = _unit3d(params["Conv3d_2c_3x3"], x)
    x = _max_pool3d(x, (1, 3, 3), (1, 2, 2))
    x = _inception(params["Mixed_3b"], x)
    x = _inception(params["Mixed_3c"], x)
    x = _max_pool3d(x, (3, 3, 3), (2, 2, 2))
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception(params[name], x)
    x = _max_pool3d(x, (2, 2, 2), (2, 2, 2))
    x = _inception(params["Mixed_5b"], x)
    x = _inception(params["Mixed_5c"], x)
    # global spatial average pool (the TF model's 2x7x7 avg-pool generalized to any H/W)
    x = jnp.mean(x, axis=(2, 3), keepdims=True)
    logits = _unit3d_logits(params["logits"], x)  # (B, T', 1, 1, 400)
    return jnp.mean(logits[:, :, 0, 0, :], axis=1)


def _unit3d_logits(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Final 1x1x1 conv WITH bias, no BN, no relu (pytorch-i3d ``logits`` unit)."""
    y = jax.lax.conv_general_dilated(
        x, p["conv3d"]["kernel"].astype(x.dtype), window_strides=(1, 1, 1),
        padding="SAME", dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    return y + p["conv3d"]["bias"].astype(y.dtype)


def make_fvd_feature_extractor(params: dict):
    """Batched jitted extractor for eval.metrics.fvd_from_features."""
    fn = jax.jit(i3d_features)
    return lambda videos: fn(params, videos)


# ------------------------------------------------------------------ structure + porting
def _iter_units():
    for name, (k, cin, cout) in _STEM.items():
        yield name, k, cin, cout, True
    for name, (cin, (b0, b1a, b1b, b2a, b2b, b3b)) in _MODULES.items():
        yield f"{name}.b0", (1, 1, 1), cin, b0, True
        yield f"{name}.b1a", (1, 1, 1), cin, b1a, True
        yield f"{name}.b1b", (3, 3, 3), b1a, b1b, True
        yield f"{name}.b2a", (1, 1, 1), cin, b2a, True
        yield f"{name}.b2b", (3, 3, 3), b2a, b2b, True
        yield f"{name}.b3b", (1, 1, 1), cin, b3b, True
    yield "logits", (1, 1, 1), 1024, NUM_CLASSES, False


def expected_torch_keys() -> list:
    keys = []
    for unit, _, _, _, has_bn in _iter_units():
        keys.append(f"{unit}.conv3d.weight")
        if has_bn:
            for s in ("weight", "bias", "running_mean", "running_var"):
                keys.append(f"{unit}.bn.{s}")
        else:
            keys.append(f"{unit}.conv3d.bias")
    return keys


def _place(params: dict, unit: str, leaf: dict) -> None:
    node = params
    parts = unit.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = leaf


def init_synthetic(rng: jax.Array, scale: float = 0.05) -> dict:
    params: dict = {}
    for unit, (kt, kh, kw), cin, cout, has_bn in _iter_units():
        rng, k = jax.random.split(rng)
        leaf = {"conv3d": {"kernel": jax.random.normal(k, (kt, kh, kw, cin, cout)) * scale}}
        if has_bn:
            leaf["bn"] = {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
                          "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}
        else:
            leaf["conv3d"]["bias"] = jnp.zeros((cout,))
        _place(params, unit, leaf)
    return params


def port_torch_state_dict(state_dict: dict) -> dict:
    """pytorch-i3d ``state_dict`` -> nested param dict. Conv kernels OIDHW -> DHWIO."""
    params: dict = {}
    missing = []
    for unit, (kt, kh, kw), cin, cout, has_bn in _iter_units():
        try:
            w = np.asarray(state_dict[f"{unit}.conv3d.weight"])  # (O, I, D, H, W)
        except KeyError as e:
            missing.append(str(e))
            continue
        if w.shape != (cout, cin, kt, kh, kw):
            raise ValueError(f"{unit}.conv3d.weight: got {w.shape}, "
                             f"want {(cout, cin, kt, kh, kw)}")
        leaf = {"conv3d": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}}
        if has_bn:
            leaf["bn"] = {
                "weight": jnp.asarray(np.asarray(state_dict[f"{unit}.bn.weight"])),
                "bias": jnp.asarray(np.asarray(state_dict[f"{unit}.bn.bias"])),
                "mean": jnp.asarray(np.asarray(state_dict[f"{unit}.bn.running_mean"])),
                "var": jnp.asarray(np.asarray(state_dict[f"{unit}.bn.running_var"]))}
        else:
            leaf["conv3d"]["bias"] = jnp.asarray(
                np.asarray(state_dict[f"{unit}.conv3d.bias"]))
        _place(params, unit, leaf)
    if missing:
        raise KeyError(f"state_dict missing {len(missing)} keys, e.g. {missing[:3]}")
    return params

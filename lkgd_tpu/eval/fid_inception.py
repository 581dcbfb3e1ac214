"""FID InceptionV3 feature extractor (pool3, 2048-d) — functional JAX, eval-only.

The reference computes FID with torchmetrics' ``FrechetInceptionDistance``
(`/root/reference/gradios/compute_metrics.py:124-131`), which wraps pytorch-fid's
InceptionV3 — torchvision's InceptionV3 with the FID-specific pooling patches
(``count_include_pad=False`` average pools in the A/C/E blocks and a max pool in the
second E block's pool branch) and the TF-ported ``pt_inception-2015-12-05`` weights.

This module re-implements that exact network as a pure function over a nested param
dict whose keys mirror the torch ``state_dict`` names (``Mixed_5b.branch1x1.conv`` ...),
so :func:`port_torch_state_dict` is a mechanical re-keying: conv kernels transpose
OIHW->HWIO, BatchNorm eval stats apply as-is. Images are NHWC in [0, 1]; the standard
FID pre-processing (bilinear resize to 299 + scale to [-1, 1]) lives in
:func:`preprocess`.

Use with eval.metrics.fid_from_features for standard, published-comparable FID.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3


# ------------------------------------------------------------------ primitive layers
def _conv(p: dict, x: jnp.ndarray, stride=(1, 1), padding=((0, 0), (0, 0))) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_eval(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["weight"] * inv).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["weight"] * inv).astype(x.dtype)
    return x * scale + bias


def basic_conv2d(p: dict, x: jnp.ndarray, stride=(1, 1), padding=((0, 0), (0, 0))):
    """torchvision BasicConv2d: bias-free conv + eval BatchNorm(eps=1e-3) + relu."""
    return jax.nn.relu(_bn_eval(p["bn"], _conv(p["conv"], x, stride, padding)))


def _avg_pool3_nopad(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool, ``count_include_pad=False`` (the pytorch-fid patch):
    border windows divide by the number of in-bounds taps, not 9."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, ..., None]
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sums / counts


def _max_pool(x: jnp.ndarray, window: int, stride: int, pad: int = 0) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


# ------------------------------------------------------------------ inception blocks
def _inception_a(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    b1 = basic_conv2d(p["branch1x1"], x)
    b5 = basic_conv2d(p["branch5x5_1"], x)
    b5 = basic_conv2d(p["branch5x5_2"], b5, padding=((2, 2), (2, 2)))
    b3 = basic_conv2d(p["branch3x3dbl_1"], x)
    b3 = basic_conv2d(p["branch3x3dbl_2"], b3, padding=((1, 1), (1, 1)))
    b3 = basic_conv2d(p["branch3x3dbl_3"], b3, padding=((1, 1), (1, 1)))
    bp = basic_conv2d(p["branch_pool"], _avg_pool3_nopad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    b3 = basic_conv2d(p["branch3x3"], x, stride=(2, 2))
    bd = basic_conv2d(p["branch3x3dbl_1"], x)
    bd = basic_conv2d(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = basic_conv2d(p["branch3x3dbl_3"], bd, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h, w = ((0, 0), (3, 3)), ((3, 3), (0, 0))  # (1,7) and (7,1) paddings
    b1 = basic_conv2d(p["branch1x1"], x)
    b7 = basic_conv2d(p["branch7x7_1"], x)
    b7 = basic_conv2d(p["branch7x7_2"], b7, padding=h)
    b7 = basic_conv2d(p["branch7x7_3"], b7, padding=w)
    bd = basic_conv2d(p["branch7x7dbl_1"], x)
    bd = basic_conv2d(p["branch7x7dbl_2"], bd, padding=w)
    bd = basic_conv2d(p["branch7x7dbl_3"], bd, padding=h)
    bd = basic_conv2d(p["branch7x7dbl_4"], bd, padding=w)
    bd = basic_conv2d(p["branch7x7dbl_5"], bd, padding=h)
    bp = basic_conv2d(p["branch_pool"], _avg_pool3_nopad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    b3 = basic_conv2d(p["branch3x3_1"], x)
    b3 = basic_conv2d(p["branch3x3_2"], b3, stride=(2, 2))
    b7 = basic_conv2d(p["branch7x7x3_1"], x)
    b7 = basic_conv2d(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = basic_conv2d(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = basic_conv2d(p["branch7x7x3_4"], b7, stride=(2, 2))
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p: dict, x: jnp.ndarray, pool: str) -> jnp.ndarray:
    b1 = basic_conv2d(p["branch1x1"], x)
    b3 = basic_conv2d(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        basic_conv2d(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        basic_conv2d(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0)))], axis=-1)
    bd = basic_conv2d(p["branch3x3dbl_1"], x)
    bd = basic_conv2d(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        basic_conv2d(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        basic_conv2d(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0)))], axis=-1)
    # pytorch-fid: FIDInceptionE_1 uses count_include_pad=False avg pool,
    # FIDInceptionE_2 (the final block) a 3x3 stride-1 MAX pool
    pooled = _avg_pool3_nopad(x) if pool == "avg" else _max_pool(x, 3, 1, pad=1)
    bp = basic_conv2d(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ------------------------------------------------------------------ full network
def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """NHWC float images in [0, 1] -> bilinear 299x299, scaled to [-1, 1]
    (pytorch-fid's resize_input + normalize_input)."""
    x = images.astype(jnp.float32)
    if x.shape[1:3] != (299, 299):
        # torchmetrics/pytorch-fid use F.interpolate WITHOUT antialiasing; jax's
        # antialias default would filter downscales differently and silently break
        # comparability with published FID numbers
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear",
                             antialias=False)
    return x * 2.0 - 1.0


def inception_v3_features(params: dict, images: jnp.ndarray) -> jnp.ndarray:
    """Images NHWC in [0, 1] -> pool3 features (B, 2048). The FID feature map."""
    x = preprocess(images)
    x = basic_conv2d(params["Conv2d_1a_3x3"], x, stride=(2, 2))
    x = basic_conv2d(params["Conv2d_2a_3x3"], x)
    x = basic_conv2d(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
    x = _max_pool(x, 3, 2)
    x = basic_conv2d(params["Conv2d_3b_1x1"], x)
    x = basic_conv2d(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x, 3, 2)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x, pool="avg")
    x = _inception_e(params["Mixed_7c"], x, pool="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def make_fid_feature_extractor(params: dict):
    """Batched jitted extractor for eval.metrics.fid_from_features."""
    fn = jax.jit(inception_v3_features)
    return lambda images: fn(params, images)


# ------------------------------------------------------------------ structure + porting
# (block -> branch -> (kernel_h, kernel_w, in, out)); stem listed separately
_A = lambda c_in, pool: {
    "branch1x1": (1, 1, c_in, 64), "branch5x5_1": (1, 1, c_in, 48),
    "branch5x5_2": (5, 5, 48, 64), "branch3x3dbl_1": (1, 1, c_in, 64),
    "branch3x3dbl_2": (3, 3, 64, 96), "branch3x3dbl_3": (3, 3, 96, 96),
    "branch_pool": (1, 1, c_in, pool)}
_C = lambda c7: {
    "branch1x1": (1, 1, 768, 192), "branch7x7_1": (1, 1, 768, c7),
    "branch7x7_2": (1, 7, c7, c7), "branch7x7_3": (7, 1, c7, 192),
    "branch7x7dbl_1": (1, 1, 768, c7), "branch7x7dbl_2": (7, 1, c7, c7),
    "branch7x7dbl_3": (1, 7, c7, c7), "branch7x7dbl_4": (7, 1, c7, c7),
    "branch7x7dbl_5": (1, 7, c7, 192), "branch_pool": (1, 1, 768, 192)}
_E = lambda c_in: {
    "branch1x1": (1, 1, c_in, 320), "branch3x3_1": (1, 1, c_in, 384),
    "branch3x3_2a": (1, 3, 384, 384), "branch3x3_2b": (3, 1, 384, 384),
    "branch3x3dbl_1": (1, 1, c_in, 448), "branch3x3dbl_2": (3, 3, 448, 384),
    "branch3x3dbl_3a": (1, 3, 384, 384), "branch3x3dbl_3b": (3, 1, 384, 384),
    "branch_pool": (1, 1, c_in, 192)}

LAYOUT = {
    "Conv2d_1a_3x3": (3, 3, 3, 32), "Conv2d_2a_3x3": (3, 3, 32, 32),
    "Conv2d_2b_3x3": (3, 3, 32, 64), "Conv2d_3b_1x1": (1, 1, 64, 80),
    "Conv2d_4a_3x3": (3, 3, 80, 192),
    "Mixed_5b": _A(192, 32), "Mixed_5c": _A(256, 64), "Mixed_5d": _A(288, 64),
    "Mixed_6a": {"branch3x3": (3, 3, 288, 384), "branch3x3dbl_1": (1, 1, 288, 64),
                 "branch3x3dbl_2": (3, 3, 64, 96), "branch3x3dbl_3": (3, 3, 96, 96)},
    "Mixed_6b": _C(128), "Mixed_6c": _C(160), "Mixed_6d": _C(160), "Mixed_6e": _C(192),
    "Mixed_7a": {"branch3x3_1": (1, 1, 768, 192), "branch3x3_2": (3, 3, 192, 320),
                 "branch7x7x3_1": (1, 1, 768, 192), "branch7x7x3_2": (1, 7, 192, 192),
                 "branch7x7x3_3": (7, 1, 192, 192), "branch7x7x3_4": (3, 3, 192, 192)},
    "Mixed_7b": _E(1280), "Mixed_7c": _E(2048),
}


def _iter_convs():
    for block, spec in LAYOUT.items():
        if isinstance(spec, tuple):
            yield block, spec
        else:
            for branch, shape in spec.items():
                yield f"{block}.{branch}", shape


def expected_torch_keys() -> list:
    """Exact ``state_dict`` key manifest of the pytorch-fid InceptionV3 conv trunk
    (fc / AuxLogits excluded — FID never runs them)."""
    keys = []
    for mod, _ in _iter_convs():
        keys.append(f"{mod}.conv.weight")
        for s in ("weight", "bias", "running_mean", "running_var"):
            keys.append(f"{mod}.bn.{s}")
    return keys


def init_synthetic(rng: jax.Array, scale: float = 0.05) -> dict:
    """Random params in the ported structure (for tests / weight-free smoke runs)."""
    params: dict = {}
    for mod, (kh, kw, cin, cout) in _iter_convs():
        rng, k = jax.random.split(rng)
        leaf = {"conv": {"kernel": jax.random.normal(k, (kh, kw, cin, cout)) * scale},
                "bn": {"weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
                       "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}}
        node = params
        for part in mod.split(".")[:-1]:
            node = node.setdefault(part, {})
        node[mod.split(".")[-1]] = leaf
    return params


def port_torch_state_dict(state_dict: dict) -> dict:
    """Map a pytorch-fid / torchvision InceptionV3 ``state_dict`` (tensors or numpy)
    into the nested param dict :func:`inception_v3_features` consumes. Validates that
    every expected conv-trunk key is present and every kernel shape matches."""
    params: dict = {}
    missing = []
    for mod, (kh, kw, cin, cout) in _iter_convs():
        try:
            w = np.asarray(state_dict[f"{mod}.conv.weight"])  # OIHW
            bn = {s: np.asarray(state_dict[f"{mod}.bn.{s}"]) for s in
                  ("weight", "bias", "running_mean", "running_var")}
        except KeyError as e:
            missing.append(str(e))
            continue
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(f"{mod}.conv.weight: got {w.shape}, "
                             f"want {(cout, cin, kh, kw)}")
        leaf = {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))},
                "bn": {"weight": jnp.asarray(bn["weight"]),
                       "bias": jnp.asarray(bn["bias"]),
                       "mean": jnp.asarray(bn["running_mean"]),
                       "var": jnp.asarray(bn["running_var"])}}
        node = params
        for part in mod.split(".")[:-1]:
            node = node.setdefault(part, {})
        node[mod.split(".")[-1]] = leaf
    if missing:
        raise KeyError(f"state_dict is missing {len(missing)} conv-trunk keys, "
                       f"e.g. {missing[:3]}")
    return params

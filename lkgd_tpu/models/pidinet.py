"""PidiNet edge detector, TPU-native — the reference's softedge annotator.

The reference's ``softedge`` ControlNet preprocessor defaults to ``softedge_pidsafe``
(`/root/reference/utils/controlnet_utils.py:99-101` -> controlnet_aux
``PidiNetDetector``), running the "table5_pidinet" model (Su et al., Pixel Difference
Networks, ICCV'21): a 4-stage CNN whose convs are *pixel-difference* operators (CDC —
central difference, ad — angular difference, rd — radial difference, cv — vanilla, in
the 'carv4' pattern), with a compact dilation module (CDCM) + compact spatial attention
(CSAM) per side output and a fused 4->1 classifier head.

TPU-first design: the PDC operators are ALGEBRAICALLY CONVERTED to plain convolutions
at porting time (pidinet's own ``convert_pidinet`` trick: cd folds the center-minus-sum
into the center tap; ad subtracts the clockwise-rotated kernel; rd expands the 3x3
kernel onto a 5x5 ring with negated inner taps) — the runtime graph is pure
channels-last convs, maxpools and sigmoids that XLA fuses; no gather/unfold ops.
Checkpoint: lllyasviel Annotators ``table5_pidinet.pth`` (raw, unconverted weights) via
``port_pidinet`` (strict naming).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# carv4: the op pattern for the 16 PDC convs (init + 15 block convs), repeated per
# stage (pidinet models/config.py 'carv4')
CARV4 = ("cd", "ad", "rd", "cv") * 4


class PDCBlock(nn.Module):
    """pidinet PDCBlock (converted form): [maxpool2 +] depthwise conv (3x3 or 5x5 for
    rd) -> ReLU -> 1x1 conv, residual add (1x1 shortcut when downsampling)."""

    out_channels: int
    op: str
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1]
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        k = 5 if self.op == "rd" else 3
        y = nn.Conv(ci, (k, k), padding=k // 2, feature_group_count=ci, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        if self.stride > 1:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + y


class CDCM(nn.Module):
    """Compact dilation conv module: ReLU -> 1x1 -> four parallel dilated 3x3 convs
    (d = 5, 7, 9, 11, bias-free) summed."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv1")(
            nn.relu(x))
        outs = []
        for i, d in enumerate((5, 7, 9, 11)):
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=d,
                                kernel_dilation=(d, d), use_bias=False,
                                dtype=self.dtype, name=f"conv2_{i + 1}")(h))
        return outs[0] + outs[1] + outs[2] + outs[3]


class CSAM(nn.Module):
    """Compact spatial attention: ReLU -> 1x1 (ch->4) -> 3x3 (4->1, bias-free) ->
    sigmoid, multiplied onto the input."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv1")(nn.relu(x))
        a = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(a)
        return x * jax.nn.sigmoid(a)


class PiDiNet(nn.Module):
    """table5_pidinet (inplane 60, dil 24, sa True). Input (B, H, W, 3) in [0, 1]
    (controlnet_aux feeds pixels/255 directly, no mean/std); H, W multiples of 8.
    Returns the FUSED edge map (B, H, W) in [0, 1] — controlnet_aux uses
    ``results[-1]``, the classifier over the four side outputs."""

    inplane: int = 60
    dil: int = 24
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, _ = x.shape
        c = self.inplane
        h = nn.Conv(c, (3, 3), padding=1, strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="init_block")(x.astype(self.dtype))
        ops = CARV4
        planes = []
        # stage 1: 3 blocks at c; stages 2-4: 4 blocks each, first downsamples
        h = PDCBlock(c, ops[1], dtype=self.dtype, name="block1_1")(h)
        h = PDCBlock(c, ops[2], dtype=self.dtype, name="block1_2")(h)
        h = PDCBlock(c, ops[3], dtype=self.dtype, name="block1_3")(h)
        planes.append(h)
        c2 = c * 2
        h = PDCBlock(c2, ops[4], stride=2, dtype=self.dtype, name="block2_1")(h)
        h = PDCBlock(c2, ops[5], dtype=self.dtype, name="block2_2")(h)
        h = PDCBlock(c2, ops[6], dtype=self.dtype, name="block2_3")(h)
        h = PDCBlock(c2, ops[7], dtype=self.dtype, name="block2_4")(h)
        planes.append(h)
        c4 = c * 4
        h = PDCBlock(c4, ops[8], stride=2, dtype=self.dtype, name="block3_1")(h)
        h = PDCBlock(c4, ops[9], dtype=self.dtype, name="block3_2")(h)
        h = PDCBlock(c4, ops[10], dtype=self.dtype, name="block3_3")(h)
        h = PDCBlock(c4, ops[11], dtype=self.dtype, name="block3_4")(h)
        planes.append(h)
        h = PDCBlock(c4, ops[12], stride=2, dtype=self.dtype, name="block4_1")(h)
        h = PDCBlock(c4, ops[13], dtype=self.dtype, name="block4_2")(h)
        h = PDCBlock(c4, ops[14], dtype=self.dtype, name="block4_3")(h)
        h = PDCBlock(c4, ops[15], dtype=self.dtype, name="block4_4")(h)
        planes.append(h)

        sides = []
        for i, p in enumerate(planes):
            e = CDCM(self.dil, dtype=self.dtype, name=f"dilations_{i}")(p)
            e = CSAM(dtype=self.dtype, name=f"attentions_{i}")(e)
            e = nn.Conv(1, (1, 1), dtype=self.dtype, name=f"conv_reduces_{i}")(e)
            # bilinear half-pixel upsample back to input size (torch F.interpolate
            # bilinear align_corners=False), then sigmoid
            e = jax.image.resize(e.astype(jnp.float32), (b, hh, ww, 1), "bilinear")
            sides.append(e)
        fuse = jnp.concatenate(sides, axis=-1)
        fuse = nn.Conv(1, (1, 1), dtype=self.dtype, name="classifier")(
            fuse.astype(self.dtype))
        return jax.nn.sigmoid(fuse.astype(jnp.float32))[..., 0]


# ------------------------------------------------------------------ porting
def convert_pdc(op: str, weight: np.ndarray) -> np.ndarray:
    """pidinet ``convert_pidinet``: fold each pixel-difference op into a plain conv
    kernel (torch OIHW layout in AND out).

    cd: y = sum_k w_k x_k - x_center * sum(w)  -> center tap -= sum(w)
    ad: y = sum_k w_k (x_k - x_rot(k))         -> w - w[clockwise-rotated index]
    rd: 3x3 (minus center) placed on the 5x5 radius-2 ring, negated at the
        radius-1 inner positions (pidinet models/ops.py conversion table)."""
    w = np.asarray(weight, np.float32)
    o, i = w.shape[:2]
    if op == "cv":
        return w
    if op == "cd":
        out = w.copy().reshape(o, i, 9)
        out[:, :, 4] = out[:, :, 4] - w.reshape(o, i, 9).sum(axis=2)
        return out.reshape(o, i, 3, 3)
    if op == "ad":
        flat = w.reshape(o, i, 9)
        out = flat - flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]
        return out.reshape(o, i, 3, 3)
    if op == "rd":
        flat = w.reshape(o, i, 9)
        buf = np.zeros((o, i, 25), np.float32)
        ring = [0, 2, 4, 10, 14, 20, 22, 24]
        inner = [6, 7, 8, 11, 13, 16, 17, 18]
        taps = [0, 1, 2, 3, 5, 6, 7, 8]
        buf[:, :, ring] = flat[:, :, taps]
        buf[:, :, inner] = -flat[:, :, taps]
        return buf.reshape(o, i, 5, 5)
    raise ValueError(f"unknown pdc op {op}")


def pidinet_key_map(key: str) -> Optional[str]:
    k = key.replace("module.", "")
    k = k.replace("init_block.weight", "init_block.kernel")
    for i in range(1, 5):
        for j in range(1, 5):
            k = k.replace(f"block{i}_{j}.conv1.weight", f"block{i}_{j}.conv1.kernel")
            k = k.replace(f"block{i}_{j}.conv2.weight", f"block{i}_{j}.conv2.kernel")
            k = k.replace(f"block{i}_{j}.shortcut.weight", f"block{i}_{j}.shortcut.kernel")
    for i in range(4):
        k = k.replace(f"dilations.{i}.conv1.weight", f"dilations_{i}.conv1.kernel")
        for d in range(1, 5):
            k = k.replace(f"dilations.{i}.conv2_{d}.weight", f"dilations_{i}.conv2_{d}.kernel")
        k = k.replace(f"attentions.{i}.conv1.weight", f"attentions_{i}.conv1.kernel")
        k = k.replace(f"attentions.{i}.conv2.weight", f"attentions_{i}.conv2.kernel")
        k = k.replace(f"conv_reduces.{i}.weight", f"conv_reduces_{i}.kernel")
        k = k.replace(f"dilations.{i}.conv1.bias", f"dilations_{i}.conv1.bias")
        k = k.replace(f"attentions.{i}.conv1.bias", f"attentions_{i}.conv1.bias")
        k = k.replace(f"conv_reduces.{i}.bias", f"conv_reduces_{i}.bias")
    k = k.replace("classifier.weight", "classifier.kernel")
    return k


# which raw weights are PDC convs needing conversion: init_block + every blockN_M.conv1
def _pdc_op_for(key: str) -> Optional[str]:
    k = key.replace("module.", "")
    if k == "init_block.weight":
        return CARV4[0]
    import re

    m = re.match(r"block(\d)_(\d)\.conv1\.weight", k)
    if m:
        stage, blk = int(m.group(1)), int(m.group(2))
        idx = {1: 0, 2: 3, 3: 7, 4: 11}[stage] + blk
        return CARV4[idx]
    return None


def port_pidinet(state_dict, template, strict: bool = True):
    """table5_pidinet.pth (RAW pdc weights) -> PiDiNet params: converts each pixel-
    difference kernel to its plain-conv equivalent, then fits torch OIHW -> HWIO
    (depthwise convs reshape to HWI(1->)O with flax feature_group_count layout)."""
    from lkgd_tpu.utils.porting import _fit_tensor

    leaves = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        leaves[keys] = (tuple(leaf.shape), leaf.dtype)

    produced, unused = {}, []
    for key, tensor in state_dict.items():
        t = np.asarray(tensor, np.float32)
        op = _pdc_op_for(key)
        if op is not None:
            t = convert_pdc(op, t)
        mapped = pidinet_key_map(key)
        if mapped is None:
            continue
        path = ("params",) + tuple(mapped.split("."))
        if path not in leaves:
            unused.append(key)
            continue
        want = leaves[path][0]
        if path[-1] == "kernel" and t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO (depthwise: I is 1 already)
        fitted = t if t.shape == want else _fit_tensor(t, want, is_kernel=False)
        if fitted is None:
            raise ValueError(f"{key}: shape {t.shape} !-> {want}")
        produced[path] = fitted.astype(leaves[path][1])
    missing = [p for p in leaves if p not in produced]
    if strict and (missing or unused):
        raise ValueError(f"pidinet port: missing {len(missing)} "
                         f"(e.g. {['/'.join(p) for p in missing[:4]]}), "
                         f"unused {len(unused)} (e.g. {unused[:4]})")
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    return jax.tree_util.tree_unflatten(
        treedef, [produced.get(tuple(str(getattr(p, 'key', p)) for p in path),
                               np.asarray(leaf)) for path, leaf in flat])


def make_pidinet_processor(checkpoint_path: str, safe: bool = True,
                           scribble: bool = False):
    """controlnet_aux ``softedge_pidinet`` / ``softedge_pidsafe`` (the reference
    default) / ``scribble_pidinet`` processors: run PiDiNet on [0,1] RGB, then
    safe_step / scribble post-processing like the HED family."""
    from lkgd_tpu.utils.porting import load_state_dict

    model = PiDiNet()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)))
    params = port_pidinet(load_state_dict(checkpoint_path), template)
    fn = jax.jit(lambda img: model.apply(params, img))

    def process(image: np.ndarray) -> np.ndarray:
        from lkgd_tpu.models.hed import safe_step, scribble_postprocess

        h, w = image.shape[:2]
        ph, pw = -h % 8, -w % 8
        x = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
        edge = np.asarray(fn(jnp.asarray(x[None], jnp.float32)))[0, :h, :w]
        if safe:
            edge = np.asarray(safe_step(jnp.asarray(edge)))
        if scribble:
            edge = scribble_postprocess(edge)
        return np.repeat(edge[..., None], 3, axis=-1).astype(np.float32)

    return process

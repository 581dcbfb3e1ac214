"""8-bit Adam moments — the bitsandbytes AdamW8bit analog for single-chip memory.

The reference fine-tunes with ``bnb.optim.AdamW8bit`` when ``--use_8bit_adam`` is set
(`/root/reference/train_models/train_svd_lora.py:1197-1207`): both Adam moments are held
blockwise-quantized in 8 bits, cutting optimizer memory ~4x — the lever that lets a
full-model fine-tune fit one accelerator. ZeRO sharding (training/trainer.py) substitutes
on a mesh; this module is the single-chip equivalent.

TPU-native design: an ``optax.GradientTransformation`` whose state stores each moment as
``(int8 codes, fp32 per-block scales)``. Updates dequantize, apply the exact AdamW math
in fp32, and requantize — all inside one jitted step, so the fp32 moments are transient
VMEM/HBM scratch and the *persistent* state is ~1.03 bytes/param per moment
(block=256) instead of 4.

Quantization is blockwise absmax with a per-moment power map:
  * first moment m (numerator, signed): linear codes — its within-block dynamic range is
    modest and linear keeps full precision near the absmax.
  * second moment v (denominator, non-negative): a quartic map
    ``v = absmax * (code/127)^4`` — v's entries inside one block span many orders of
    magnitude (it is an EMA of g^2), and a LINEAR code truncates small entries to 0,
    making ``m / (sqrt(v) + eps)`` explode by 1/eps. The power map covers ~8 orders
    (smallest nonzero code = absmax * 127^-4 ≈ 4e-9 * absmax) at ~3-13% relative step —
    the same role as bitsandbytes' nonlinear "dynamic" code, in closed form on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class Quantized8(NamedTuple):
    """A tensor stored as int8 codes + fp32 per-block absmax scales."""

    codes: jnp.ndarray   # int8, original shape
    scales: jnp.ndarray  # fp32, (num_blocks,)


def _pad_len(n: int, block: int) -> int:
    return (-n) % block


def quantize8(x: jnp.ndarray, block: int = 256, power: int = 1) -> Quantized8:
    """Blockwise absmax int8 quantization of a flat view of ``x``.

    ``power`` selects the code map: codes = round(127 * (|x|/absmax)^(1/power)) with the
    sign carried on the code. power=1 is linear; power=4 covers ~8 orders of magnitude
    (for the Adam second moment — see module docstring)."""
    flat = x.reshape(-1)
    pad = _pad_len(flat.size, block)
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    absmax = jnp.max(jnp.abs(padded), axis=1)
    scale = jnp.where(absmax > 0, absmax, 1.0).astype(jnp.float32)
    frac = jnp.abs(padded) / scale[:, None]
    if power != 1:
        frac = frac ** (1.0 / power)
    codes = jnp.clip(jnp.round(127.0 * frac), 0, 127) * jnp.sign(padded)
    return Quantized8(codes.astype(jnp.int8).reshape(-1)[: flat.size].reshape(x.shape),
                      jnp.where(absmax > 0, absmax, 0.0).astype(jnp.float32))


def dequantize8(q: Quantized8, block: int = 256, power: int = 1) -> jnp.ndarray:
    flat = q.codes.reshape(-1).astype(jnp.float32)
    pad = _pad_len(flat.size, block)
    padded = jnp.pad(flat, (0, pad)).reshape(-1, block)
    frac = jnp.abs(padded) / 127.0
    if power != 1:
        frac = frac ** power
    out = jnp.sign(padded) * frac * q.scales[:, None]
    return out.reshape(-1)[: flat.size].reshape(q.codes.shape)


class ScaleBy8bitAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params     # pytree of Quantized8
    nu: optax.Params     # pytree of Quantized8


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      block: int = 256, min_8bit_size: int = 4096):
    """optax transform: Adam scaling with int8-quantized moments.

    Leaves smaller than ``min_8bit_size`` keep fp32 moments (bnb does the same —
    `bitsandbytes.optim.Optimizer8bit(min_8bit_size=4096)`): tiny tensors gain nothing
    and lose precision.
    """

    def is_small(x):
        return x.size < min_8bit_size

    def init(params):
        def q(x, power):
            z = jnp.zeros_like(x, dtype=jnp.float32)
            return z if is_small(x) else quantize8(z, block, power)

        return ScaleBy8bitAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda x: q(x, 1), params),
            nu=jax.tree.map(lambda x: q(x, 4), params),
        )

    def update(updates, state, params=None):
        count = optax.safe_int32_increment(state.count)

        def deq(q, power):
            return q if isinstance(q, jnp.ndarray) else dequantize8(q, block, power)

        def req(x, like, power):
            return x if isinstance(like, jnp.ndarray) else quantize8(x, block, power)

        is_q = lambda n: isinstance(n, Quantized8)  # noqa: E731
        mu = jax.tree.map(lambda g, m: b1 * deq(m, 1) + (1 - b1) * g,
                          updates, state.mu, is_leaf=is_q)
        nu = jax.tree.map(lambda g, v: b2 * deq(v, 4) + (1 - b2) * (g * g),
                          updates, state.nu, is_leaf=is_q)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        mu_q = jax.tree.map(lambda x, like: req(x, like, 1), mu, state.mu, is_leaf=is_q)
        nu_q = jax.tree.map(lambda x, like: req(x, like, 4), nu, state.nu, is_leaf=is_q)
        return new_updates, ScaleBy8bitAdamState(count, mu_q, nu_q)

    return optax.GradientTransformation(init, update)


class ScaleBy8bitAdamPackedState(NamedTuple):
    count: jnp.ndarray
    small_mu: tuple     # fp32 moments for leaves < min_8bit_size, in leaf order
    small_nu: tuple
    packed_mu: Quantized8  # ONE flat (codes, scales) pair covering all big leaves
    packed_nu: Quantized8


def _pack_partition(leaves, block: int, min_size: int):
    """Static partition of flattened leaves into (small indices, big indices with
    per-leaf padded offsets). Each big leaf pads to a block boundary so quantization
    blocks never straddle leaves — packed quantization is then bit-identical to
    per-leaf quantization."""
    small_idx, big_idx, offsets = [], [], []
    off = 0
    for i, x in enumerate(leaves):
        if x.size < min_size:
            small_idx.append(i)
        else:
            big_idx.append(i)
            offsets.append(off)
            off += x.size + _pad_len(x.size, block)
    return small_idx, big_idx, offsets, off


def _pack(leaves, big_idx, block, total):
    if not big_idx:
        return jnp.zeros((0,), jnp.float32)
    parts = []
    for i in big_idx:
        flat = leaves[i].reshape(-1).astype(jnp.float32)
        parts.append(jnp.pad(flat, (0, _pad_len(flat.size, block))))
    return jnp.concatenate(parts)


def scale_by_adam8bit_packed(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                             block: int = 256, min_8bit_size: int = 4096):
    """`scale_by_adam8bit` with all big-leaf moments packed into ONE flat buffer.

    Motivation (VERDICT r3): the per-leaf variant emits 4 quantize/dequantize chains
    (pad, reshape, reduce-max, divide, round, ...) *per trainable leaf*; at hundreds of
    adapter leaves that op count made the first train-step compile ~4x slower than fp32
    Adam (~40 min over the tunnel). Packing turns those into 4 chains total + one
    static slice per leaf. Per-leaf padding to block boundaries keeps the block
    partition identical to the per-leaf variant, so the quantized values (and therefore
    the training trajectory) are BIT-IDENTICAL (test_optim8bit.py equivalence test)."""

    def init(params):
        leaves = jax.tree.leaves(params)
        small_idx, big_idx, _, total = _pack_partition(leaves, block, min_8bit_size)
        zeros_flat = jnp.zeros((total,), jnp.float32)
        return ScaleBy8bitAdamPackedState(
            count=jnp.zeros([], jnp.int32),
            small_mu=tuple(jnp.zeros_like(leaves[i], dtype=jnp.float32)
                           for i in small_idx),
            small_nu=tuple(jnp.zeros_like(leaves[i], dtype=jnp.float32)
                           for i in small_idx),
            packed_mu=quantize8(zeros_flat, block, 1),
            packed_nu=quantize8(zeros_flat, block, 4),
        )

    def update(updates, state, params=None):
        count = optax.safe_int32_increment(state.count)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        leaves, treedef = jax.tree.flatten(updates)
        small_idx, big_idx, offsets, total = _pack_partition(leaves, block,
                                                             min_8bit_size)

        out = [None] * len(leaves)
        # big leaves: one packed dequant -> EMA -> update -> requant chain
        g_flat = _pack(leaves, big_idx, block, total)
        mu = b1 * dequantize8(state.packed_mu, block, 1) + (1 - b1) * g_flat
        nu = b2 * dequantize8(state.packed_nu, block, 4) + (1 - b2) * (g_flat * g_flat)
        upd_flat = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        for i, off in zip(big_idx, offsets):
            n = leaves[i].size
            out[i] = upd_flat[off:off + n].reshape(leaves[i].shape)
        # small leaves: plain fp32 Adam
        new_small_mu, new_small_nu = [], []
        for j, i in enumerate(small_idx):
            m = b1 * state.small_mu[j] + (1 - b1) * leaves[i]
            v = b2 * state.small_nu[j] + (1 - b2) * (leaves[i] * leaves[i])
            new_small_mu.append(m)
            new_small_nu.append(v)
            out[i] = (m / c1) / (jnp.sqrt(v / c2) + eps)
        new_state = ScaleBy8bitAdamPackedState(
            count, tuple(new_small_mu), tuple(new_small_nu),
            quantize8(mu, block, 1), quantize8(nu, block, 4))
        return jax.tree.unflatten(treedef, out), new_state

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 1e-2, block: int = 256,
              min_8bit_size: int = 4096, packed: bool = False,
              mask: Optional[optax.Params] = None) -> optax.GradientTransformation:
    """AdamW with 8-bit moment state (reference `train_svd_lora.py:1197-1207`).

    ``packed=True`` selects the flat-packed moment layout (same math bit-for-bit,
    ~O(1) instead of O(leaves) quantization chains in the compiled step)."""
    scale = scale_by_adam8bit_packed if packed else scale_by_adam8bit
    return optax.chain(
        scale(b1=b1, b2=b2, eps=eps, block=block, min_8bit_size=min_8bit_size),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def opt_state_bytes(opt_state) -> int:
    """Persistent optimizer-state bytes (what an fp32->8bit switch is buying)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(opt_state)
               if hasattr(x, "dtype"))

"""Quaternion linear layer — Hamilton-product weight sharing as one structured matmul.

The reference depends on the external ``core_qnn.quaternion_layers.QuaternionLinearAutograd``
package (imported at `/root/reference/models/unet_spatio_temporal_condition.py:15,213-218`),
which is not vendored there; this is an independent TPU-native implementation of the same
math (Parcollet et al., "Quaternion Recurrent Neural Networks").

A quaternion linear maps 4 channel groups (r, i, j, k) of size in/4 to out/4 groups using a
single shared set of 4 weight matrices arranged in the Hamilton-product block structure:

    W = [[ r,  i,  j,  k],
         [-i,  r,  k, -j],
         [-j, -k,  r,  i],
         [-k,  j, -i,  r]]   (block rows = input groups, block cols = output groups)

so ``y = x @ W`` is ONE (in, out) matmul — ideal for the MXU; we assemble W on the fly from
the 4 small factors (XLA fuses the concatenation into the matmul's operand layout).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def assemble_quaternion_kernel(wr: jnp.ndarray, wi: jnp.ndarray, wj: jnp.ndarray,
                               wk: jnp.ndarray) -> jnp.ndarray:
    """Assemble the (in, out) Hamilton-block kernel from 4 (in/4, out/4) factors.

    Matches core_qnn's layout: block-row order over input groups is
    col_r = [r; -i; -j; -k], col_i = [i; r; -k; j], col_j = [j; k; r; -i],
    col_k = [k; -j; i; r], concatenated along the output axis.
    """
    col_r = jnp.concatenate([wr, -wi, -wj, -wk], axis=0)
    col_i = jnp.concatenate([wi, wr, -wk, wj], axis=0)
    col_j = jnp.concatenate([wj, wk, wr, -wi], axis=0)
    col_k = jnp.concatenate([wk, -wj, wi, wr], axis=0)
    return jnp.concatenate([col_r, col_i, col_j, col_k], axis=1)


def quaternion_linear(x: jnp.ndarray, wr: jnp.ndarray, wi: jnp.ndarray, wj: jnp.ndarray,
                      wk: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    kernel = assemble_quaternion_kernel(wr, wi, wj, wk).astype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def quaternion_init(key: jax.Array, in_features: int, out_features: int, criterion: str = "glorot"):
    """Quaternion-valued init: chi(4)-distributed modulus, random unit imaginary axis.

    Returns (wr, wi, wj, wk) each of shape (in/4, out/4).
    """
    fan_in, fan_out = in_features // 4, out_features // 4
    if criterion == "glorot":
        s = 1.0 / jnp.sqrt(2.0 * (fan_in + fan_out))
    elif criterion == "he":
        s = 1.0 / jnp.sqrt(2.0 * fan_in)
    else:
        raise ValueError(criterion)
    shape = (fan_in, fan_out)
    k_mod, k_axis, k_phase = jax.random.split(key, 3)
    # chi with 4 dof = norm of 4 iid standard normals
    modulus = jnp.linalg.norm(jax.random.normal(k_mod, shape + (4,)), axis=-1) * s
    axis = jax.random.normal(k_axis, shape + (3,))
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-8)
    phase = jax.random.uniform(k_phase, shape, minval=-jnp.pi, maxval=jnp.pi)
    wr = modulus * jnp.cos(phase)
    sin = modulus * jnp.sin(phase)
    return wr, sin * axis[..., 0], sin * axis[..., 1], sin * axis[..., 2]


class QuaternionLinear(nn.Module):
    """Flax module matching core_qnn's QuaternionLinearAutograd(in, out)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.in_features % 4 == 0 and self.out_features % 4 == 0
        shape = (self.in_features // 4, self.out_features // 4)

        def _factor_init(idx):
            def init(key, _shape, _dtype=jnp.float32):
                factors = quaternion_init(key, self.in_features, self.out_features)
                return factors[idx].astype(_dtype)
            return init

        wr = self.param("r_weight", _factor_init(0), shape)
        wi = self.param("i_weight", _factor_init(1), shape)
        wj = self.param("j_weight", _factor_init(2), shape)
        wk = self.param("k_weight", _factor_init(3), shape)
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,)) if self.use_bias else None
        x = x.astype(self.dtype)
        return quaternion_linear(x, wr.astype(self.dtype), wi.astype(self.dtype),
                                 wj.astype(self.dtype), wk.astype(self.dtype),
                                 None if bias is None else bias.astype(self.dtype))

"""Does int8 weight-only storage survive a denoising scan under XLA?

The serving idea (reference `CogVideo-main/inference/cli_demo_quantization.py` analog):
store transformer weights as int8 + per-column scales, dequantize at the consumer
matmul. The HBM win exists only if XLA keeps `(w_s8 * scale) @ x` fused per-use
(weights stream from HBM as int8) instead of hoisting a materialized bf16 weight
buffer out of the `lax.scan` (loop-invariant code motion would double-store).

Run on the real chip: prints compiled peak-memory for (a) bf16 weights, (b) int8+dequant
weights, and greps the optimized HLO for a hoisted convert. Verdict: wire int8 serving
only if (b)'s argument+temp bytes are meaningfully below (a)'s.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

C, F, STEPS, ROWS = 3072, 12288, 8, 4096


def make_scan(weights_kind: str):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(C, F)), jnp.bfloat16)
    if weights_kind == "bf16":
        params = (w,)

        def matmul(x, p):
            return x @ p[0]
    else:
        from lkgd_tpu.ops.quantization import quantize_cols

        wq, scale = quantize_cols(w.astype(jnp.float32))
        params = (wq, jnp.asarray(scale, jnp.float32))

        def matmul(x, p):
            wq, scale = p
            # dequant at the consumer; the question is whether XLA hoists this
            return x @ (wq.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16))

    def body(x, _):
        y = matmul(x, params)
        x = jnp.tanh(y[:, :C])  # keep the carry shape, force dependence
        return x, ()

    def fn(x):
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    return fn, params


def main():
    x = jnp.zeros((ROWS, C), jnp.bfloat16)
    for kind in ("bf16", "int8"):
        fn, _ = make_scan(kind)
        compiled = jax.jit(fn).lower(x).compile()
        try:
            m = compiled.memory_analysis()
            print(f"{kind}: args {m.argument_size_in_bytes/2**20:.1f} MiB, "
                  f"temps {m.temp_size_in_bytes/2**20:.1f} MiB, "
                  f"total {(m.argument_size_in_bytes+m.temp_size_in_bytes)/2**20:.1f} MiB")
        except Exception as e:  # noqa: BLE001 — memory_analysis is backend-dependent
            print(f"{kind}: memory_analysis unavailable ({e})")
        if kind == "int8":
            hlo = compiled.as_text()
            # hoisted = the full-weight dequant (convert of s8[C,F] or a bf16[C,F]
            # multiply) executes in the ENTRY computation, i.e. outside the while body.
            # HLO text prints every computation (fusion bodies, while body/cond) as its
            # own block BEFORE/AFTER entry, so scoping to the ENTRY block — not "text
            # before the word 'while'" — is what distinguishes inside from outside.
            m_entry = re.search(r"^ENTRY [^\n]*\{(.*?)^\}", hlo, re.S | re.M)
            entry = m_entry.group(1) if m_entry else hlo
            hoisted = (re.search(rf"convert[^\n]*s8\[{C},{F}\]", entry) is not None
                       or re.search(rf"bf16\[{C},{F}\][^\n]*multiply", entry) is not None
                       # hoisted-and-fused variant: a fusion producing the full bf16
                       # weight called from ENTRY
                       or re.search(rf"bf16\[{C},{F}\][^\n]*fusion", entry) is not None)
            print("int8 dequant HOISTED out of the loop (win lost)" if hoisted
                  else "int8 dequant stays inside the loop body (HBM win plausible)")


if __name__ == "__main__":
    main()

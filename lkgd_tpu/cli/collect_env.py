"""Environment dump for bug reports — the reference's ``collect_env.py`` analog,
TPU-flavored: JAX/XLA versions, visible devices + HBM, library versions, the LKGD_*
behavior flags, and the compilation-cache state (the things that actually change TPU
behavior, instead of CUDA/driver probing).

Usage: ``python -m lkgd_tpu.cli.collect_env [--no-device]``
(``--no-device`` skips backend initialization — useful when the device tunnel is down).
"""

from __future__ import annotations

import argparse
import importlib
import os
import platform
import sys


def _ver(mod: str) -> str:
    try:
        m = importlib.import_module(mod)
        return getattr(m, "__version__", "unknown")
    except Exception as e:  # noqa: BLE001 — report the failure itself
        return f"unavailable ({type(e).__name__})"


def collect(probe_device: bool = True) -> dict:
    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
        "machine": platform.machine(),
        "jax": _ver("jax"),
        "jaxlib": _ver("jaxlib"),
        "flax": _ver("flax"),
        "optax": _ver("optax"),
        "orbax-checkpoint": _ver("orbax.checkpoint"),
        "numpy": _ver("numpy"),
        "einops": _ver("einops"),
        "torch (oracles only)": _ver("torch"),
        "transformers": _ver("transformers"),
        "safetensors": _ver("safetensors"),
    }
    info["env:JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "<unset>")
    info["env:XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "<unset>")
    info["env:LKGD_*"] = {k: v for k, v in os.environ.items()
                          if k.startswith("LKGD_")} or "<none>"
    # mirror utils/compilation_cache.enable_persistent_cache's resolution exactly:
    # LKGD_JAX_CACHE, else <repo root>/.jax_cache
    cache_dir = os.environ.get("LKGD_JAX_CACHE", os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    info["compilation_cache"] = (
        f"{cache_dir} ({len(os.listdir(cache_dir))} entries)"
        if os.path.isdir(cache_dir) else f"{cache_dir} (absent)")
    if probe_device:
        try:
            import jax

            devs = jax.devices()
            info["backend"] = jax.default_backend()
            info["devices"] = [str(d) for d in devs]
            try:
                stats = devs[0].memory_stats() or {}
                hbm = stats.get("bytes_limit")
                if hbm:
                    info["device0_hbm"] = f"{hbm / 2**30:.1f} GiB"
            except Exception:  # noqa: BLE001 — memory stats are best-effort
                pass
        except Exception as e:  # noqa: BLE001
            info["devices"] = f"backend init failed: {e}"
    return info


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--no-device", action="store_true",
                    help="skip jax backend initialization (tunnel down / CI)")
    args = ap.parse_args()
    for k, v in collect(probe_device=not args.no_device).items():
        print(f"{k:28s}: {v}")


if __name__ == "__main__":
    main()

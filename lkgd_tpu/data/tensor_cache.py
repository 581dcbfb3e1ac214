"""ctypes binding for the native tensor cache (native/tensor_cache.cc).

The reference precomputes VAE latents and T5 prompt embeddings into a directory of .pt
files (`CogVideo-main/finetune/datasets/i2v_dataset.py:102-124`); this packs them into ONE
mmap'd append-only file with an in-memory index — the host data path for cached-latent
training (see PrecomputedLatentDataset).

Builds the shared library on first use (g++ -O2 -shared), cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List

import numpy as np

_DTYPES = {
    np.dtype("float32"): 0, np.dtype("float16"): 1, np.dtype("int32"): 2,
    np.dtype("int64"): 3, np.dtype("uint8"): 4, np.dtype("bfloat16") if hasattr(np, "bfloat16") else None: 5,
}
_DTYPE_BY_ID = {}
for k, v in list(_DTYPES.items()):
    if k is None:
        del _DTYPES[k]
    else:
        _DTYPE_BY_ID[v] = k
try:  # ml_dtypes provides numpy bfloat16
    import ml_dtypes

    _DTYPES[np.dtype(ml_dtypes.bfloat16)] = 5
    _DTYPE_BY_ID[5] = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    pass

_lib = None
_lib_lock = threading.Lock()


def _build_and_load() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        src = os.path.join(root, "native", "tensor_cache.cc")
        lib_path = os.path.join(root, "native", "libtensor_cache.so")
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            subprocess.check_call(["g++", "-O2", "-std=c++17", "-fPIC", "-shared",
                                   "-o", lib_path, src])
        lib = ctypes.CDLL(lib_path)
        lib.lkgd_cache_open.restype = ctypes.c_void_p
        lib.lkgd_cache_open.argtypes = [ctypes.c_char_p]
        lib.lkgd_cache_close.argtypes = [ctypes.c_void_p]
        lib.lkgd_cache_put.restype = ctypes.c_int
        lib.lkgd_cache_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_void_p, ctypes.c_uint64]
        lib.lkgd_cache_info.restype = ctypes.c_int
        lib.lkgd_cache_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64)]
        lib.lkgd_cache_get.restype = ctypes.c_int
        lib.lkgd_cache_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_uint64]
        lib.lkgd_cache_count.restype = ctypes.c_uint64
        lib.lkgd_cache_count.argtypes = [ctypes.c_void_p]
        lib.lkgd_cache_key.restype = ctypes.c_uint32
        lib.lkgd_cache_key.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
                                       ctypes.c_uint32]
        _lib = lib
        return lib


class TensorCache:
    def __init__(self, path: str):
        self._lib = _build_and_load()
        self._h = self._lib.lkgd_cache_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open tensor cache at {path}")

    def close(self):
        if self._h:
            self._lib.lkgd_cache_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def put(self, key: str, array: np.ndarray) -> None:
        array = np.ascontiguousarray(array)
        dt = _DTYPES.get(array.dtype)
        if dt is None:
            raise TypeError(f"unsupported dtype {array.dtype}")
        dims = (ctypes.c_uint64 * array.ndim)(*array.shape)
        rc = self._lib.lkgd_cache_put(
            self._h, key.encode(), dt, array.ndim, dims,
            array.ctypes.data_as(ctypes.c_void_p), array.nbytes)
        if rc != 0:
            raise IOError(f"cache put failed rc={rc}")

    def __contains__(self, key: str) -> bool:
        dt = ctypes.c_uint8()
        nd = ctypes.c_uint8()
        dims = (ctypes.c_uint64 * 8)()
        nb = ctypes.c_uint64()
        return self._lib.lkgd_cache_info(self._h, key.encode(), ctypes.byref(dt),
                                         ctypes.byref(nd), dims, ctypes.byref(nb)) == 0

    def get(self, key: str) -> np.ndarray:
        dt = ctypes.c_uint8()
        nd = ctypes.c_uint8()
        dims = (ctypes.c_uint64 * 8)()
        nb = ctypes.c_uint64()
        if self._lib.lkgd_cache_info(self._h, key.encode(), ctypes.byref(dt),
                                     ctypes.byref(nd), dims, ctypes.byref(nb)) != 0:
            raise KeyError(key)
        shape = tuple(dims[i] for i in range(nd.value))
        out = np.empty(shape, dtype=_DTYPE_BY_ID[dt.value])
        rc = self._lib.lkgd_cache_get(self._h, key.encode(),
                                      out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
        if rc != 0:
            raise IOError(f"cache get failed rc={rc}")
        return out

    def __len__(self) -> int:
        return int(self._lib.lkgd_cache_count(self._h))

    def keys(self) -> List[str]:
        out = []
        buf = ctypes.create_string_buffer(4096)
        for i in range(len(self)):
            n = self._lib.lkgd_cache_key(self._h, i, buf, 4096)
            if n:
                out.append(buf.value.decode())
        return out


class PrecomputedLatentDataset:
    """Training dataset over a TensorCache of precomputed tensors — the reference's
    cached-latent path (latents + prompt embeddings computed once, trained many times).

    Keys: '<sample>/latents', '<sample>/prompt_embeds', optionally
    '<sample>/image_latents', '<sample>/domain_features', '<sample>/flow_features'.
    """

    def __init__(self, cache_path: str):
        self.cache = TensorCache(cache_path)
        names = sorted({k.split("/")[0] for k in self.cache.keys()})
        self.samples = [n for n in names if f"{n}/latents" in self.cache]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        name = self.samples[idx]
        out = {"latents": self.cache.get(f"{name}/latents")}
        for field in ("prompt_embeds", "image_latents", "image_embeddings",
                      "cond_latents", "domain_features", "flow_features"):
            key = f"{name}/{field}"
            if key in self.cache:
                out[field] = self.cache.get(key)
        return out

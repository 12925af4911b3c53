"""On-demand g++ build + cache for the native components."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))


def _cache_dir() -> str:
    d = os.environ.get(
        "RWKV_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "rwkv_lm_ext_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile <name>.cpp to a cached .so and dlopen it; None on failure."""
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"lib{name}-{digest}.so")
    if not os.path.exists(out):
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-shared", "-fPIC", "-std=c++17",
            src, "-o", out + ".tmp",
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(out + ".tmp", out)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        return ctypes.CDLL(out)
    except OSError:
        return None

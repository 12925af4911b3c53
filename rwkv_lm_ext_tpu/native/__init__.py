"""Native (C++) components, built on demand with the system toolchain.

ctypes bindings (no pybind11 dependency); every native path has a pure-
Python fallback so the framework works without a compiler.
"""
from rwkv_lm_ext_tpu.native.build import load_library  # noqa: F401

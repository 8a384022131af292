"""Loader for the native host runtime (C++ extension).

Compiles native/mauve_native.cpp on first use (g++ against the running
CPython's headers) and caches the shared object next to the source.  Every
caller has a pure-numpy fallback, so a missing toolchain degrades
performance, not correctness.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading
from typing import Optional

_lock = threading.Lock()
_module = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "mauve_native.cpp"))


def _so_path() -> str:
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.abspath(os.path.join(_NATIVE_DIR, f"mauve_native{tag}"))


def _build() -> Optional[str]:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get() -> Optional[object]:
    """Return the native module, building it on first call; None if
    unavailable."""
    global _module, _tried
    if _module is not None or _tried:
        return _module
    with _lock:
        if _module is not None or _tried:
            return _module
        _tried = True
        so = _build()
        if so is None or not os.path.exists(so):
            return None
        try:
            spec = importlib.util.spec_from_file_location("mauve_native", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)  # type: ignore[union-attr]
            _module = mod
        except Exception:
            _module = None
    return _module

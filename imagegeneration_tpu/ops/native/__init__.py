"""Native (C) components with build-on-first-use and graceful fallback.

`get_fastimage()` returns the compiled _fastimage module (building it with
the system toolchain + libjpeg on first call, cached under build/) or None
when unavailable — callers fall back to cv2/PIL. See fastimage.c for what
the native path buys (DCT-domain prescaled decode, single-pass crop+resize,
GIL-free batch decode).
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

_CACHED = ...  # sentinel: not yet attempted


def _build_dir() -> Path:
    return Path(__file__).parent / "build"


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _build_dir() / f"_fastimage{suffix}"


def build_fastimage(verbose: bool = False) -> Path:
    """Compile fastimage.c into build/_fastimage<ext>.so. Raises on failure."""
    src = Path(__file__).parent / "fastimage.c"
    out = _so_path()
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CC", "cc"),
        "-O3", "-shared", "-fPIC",
        f"-I{include}",
        str(src),
        "-ljpeg",
        "-o", str(out),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(
            f"fastimage build failed: {' '.join(cmd)}\n{res.stderr}"
        )
    if verbose:
        print(f"built {out}")
    return out


def get_fastimage():
    """The compiled module, or None if the toolchain/libjpeg is unavailable."""
    global _CACHED
    if _CACHED is not ...:
        return _CACHED
    try:
        so = build_fastimage()
        spec = importlib.util.spec_from_file_location("_fastimage", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHED = mod
    except Exception:
        _CACHED = None
    return _CACHED

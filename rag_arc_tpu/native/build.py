"""On-demand compilation of the C++ components.

No pybind11 in this image, so bindings are plain ``extern "C"`` + ctypes.
The .so is rebuilt only when the source is newer than the artifact.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent
BUILD_DIR = NATIVE_DIR / "build"

_lock = threading.Lock()
_cache: dict[str, ctypes.CDLL] = {}


def load_library(name: str) -> ctypes.CDLL:
    """Compile (if stale) and dlopen ``native/<name>.cpp`` → lib<name>.so."""
    with _lock:
        if name in _cache:
            return _cache[name]
        src = NATIVE_DIR / f"{name}.cpp"
        if not src.exists():
            raise FileNotFoundError(f"no native source {src}")
        BUILD_DIR.mkdir(exist_ok=True)
        so = BUILD_DIR / f"lib{name}.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            cmd = [
                "g++",
                "-O3",
                "-march=native",
                "-std=c++17",
                "-shared",
                "-fPIC",
                str(src),
                "-o",
                str(so),
            ]
            logger.info("building native component: %s", " ".join(cmd))
            result = subprocess.run(cmd, capture_output=True, text=True)
            if result.returncode != 0:
                raise RuntimeError(
                    f"native build of {name} failed:\n{result.stderr}"
                )
        lib = ctypes.CDLL(str(so))
        _cache[name] = lib
        return lib

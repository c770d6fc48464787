"""ctypes bindings for the native C++ codec library.

Loads ``csrc/libspz_codec.so``, building it on first use if a compiler is
available; every entry point has a numpy fallback in models/spz.py, so the
package works without a toolchain. The C++ implements the same f32
numerics bit-for-bit (see csrc/spz_codec.cpp).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC, "libspz_codec.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64
_i32 = ctypes.c_int


def _build() -> bool:
    script = os.path.join(_CSRC, "build.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(["sh", script], check=True, capture_output=True,
                       timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # no compiler, sandboxed, etc.
        log.debug("native codec build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GS3D_DISABLE_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.debug("native codec load failed: %s", e)
        return None

    lib.spz_decode_fixed24.argtypes = [_u8p, _i64, _i32, _f32p]
    lib.spz_encode_fixed24.argtypes = [_f32p, _i64, _i32, _u8p]
    lib.spz_decode_scales.argtypes = [_u8p, _i64, _f32p]
    lib.spz_encode_scales.argtypes = [_f32p, _i64, _u8p]
    lib.spz_decode_quat_first3.argtypes = [_u8p, _i64, _f32p]
    lib.spz_encode_quat_first3.argtypes = [_f32p, _i64, _u8p]
    lib.spz_decode_quat_smallest3.argtypes = [_u8p, _i64, _f32p]
    lib.spz_encode_quat_smallest3.argtypes = [_f32p, _i64, _u8p]
    lib.spz_decode_colors.argtypes = [_u8p, _i64, _u8p]
    lib.spz_encode_colors.argtypes = [_u8p, _i64, _u8p]
    lib.spz_decode_sh.argtypes = [_u8p, _i64, _f32p]
    lib.spz_encode_sh.argtypes = [_f32p, _i64, _i32, _u8p]
    lib.spz_codec_abi_version.restype = _i32
    if lib.spz_codec_abi_version() != 1:
        log.warning("native codec ABI mismatch; using numpy fallback")
        return None
    _lib = lib
    log.info("native SPZ codec loaded from %s", _LIB_PATH)
    return _lib


# Threshold below which numpy is just as fast (call overhead dominates).
MIN_NATIVE_N = 4096


def available() -> bool:
    return get_lib() is not None

"""ctypes bridge to the native libav decoder (fadtk_tpu/native/decode.cc).

``decode_audio(path)`` returns ``(data, sample_rate)`` with data float32 of shape
``(channels, n_frames)`` — the same convention as torchaudio.load in the
reference (fadtk/fad.py:149) so the downstream mono-downmix (mean over channel
axis 0, fadtk/fad.py:150) is identical.

The shared library is compiled on first use (g++ + system FFmpeg dev libraries)
and cached next to the source; set ``FADTK_TPU_NATIVE_LIB`` to use a prebuilt
library instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from ..utils import PathLike, log

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


def _build_library() -> Path:
    out = _NATIVE_DIR / "libfadtk_audio.so"
    src = _NATIVE_DIR / "decode.cc"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    log.info("Building native audio decoder (libav)...")
    subprocess.run(
        ["sh", str(_NATIVE_DIR / "build.sh"), str(out)],
        check=True,
        capture_output=True,
    )
    return out


def _get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        env = os.environ.get("FADTK_TPU_NATIVE_LIB")
        path = Path(env) if env else _build_library()
        lib = ctypes.CDLL(str(path))
        lib.fadtk_decode_audio.restype = ctypes.c_int
        lib.fadtk_decode_audio.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.fadtk_free.restype = None
        lib.fadtk_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
        return lib


def decode_audio(path: PathLike) -> tuple[np.ndarray, int]:
    """Decode an audio file to (channels, n_frames) float32 + sample rate."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(path)

    lib = _get_lib()
    data = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int()
    frames = ctypes.c_longlong()
    sr = ctypes.c_int()
    err = ctypes.create_string_buffer(512)

    rc = lib.fadtk_decode_audio(
        str(path).encode(), ctypes.byref(data), ctypes.byref(channels),
        ctypes.byref(frames), ctypes.byref(sr), err, len(err),
    )
    if rc != 0:
        raise RuntimeError(f"decode failed for {path}: {err.value.decode(errors='replace')}")

    try:
        n = frames.value * channels.value
        flat = np.ctypeslib.as_array(data, shape=(n,)).copy()
    finally:
        lib.fadtk_free(data)

    # interleaved -> (channels, frames)
    return flat.reshape(frames.value, channels.value).T.copy(), sr.value

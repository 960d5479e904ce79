"""ctypes bindings for the C++ audio fast path (native/audioio.cpp).

Builds the shared library on first use if the toolchain is present; degrades
gracefully to the numpy path (utils/audio_io) otherwise. All calls release
the GIL, so `decode_resample_batch` parallelizes across a thread pool —
the TPU-native replacement for the reference's sequential per-file librosa
loop (SURVEY.md §3.1 HOT LOOP #1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from . import audio_io

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libasrnative.so")
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    makefile = os.path.join(_SRC_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", _SRC_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.asr_wav_info.restype = ctypes.c_int
        lib.asr_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.asr_wav_decode.restype = ctypes.c_int64
        lib.asr_wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.asr_resample_poly.restype = ctypes.c_int64
        lib.asr_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resample(path, target_sr: int = 22050) -> np.ndarray | None:
    """Decode one WAV to mono float32 at target_sr. None if unavailable/error."""
    lib = _load()
    if lib is None:
        return None
    path_b = os.fsencode(path)
    sr = ctypes.c_int(0)
    n = ctypes.c_int64(0)
    if lib.asr_wav_info(path_b, ctypes.byref(sr), ctypes.byref(n)) != 0:
        return None
    mono = np.empty(n.value, dtype=np.float32)
    got = lib.asr_wav_decode(
        path_b,
        mono.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.value,
        ctypes.byref(sr),
    )
    if got < 0:
        return None
    mono = mono[:got]
    if sr.value == target_sr:
        return mono
    g = np.gcd(sr.value, target_sr)
    up, down = target_sr // g, sr.value // g
    taps = audio_io.design_resample_filter(up, down)
    n_out = -(-len(mono) * up // down)
    out = np.empty(n_out, dtype=np.float32)
    wrote = lib.asr_resample_poly(
        mono.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(mono),
        up,
        down,
        taps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(taps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out,
    )
    if wrote < 0:
        return None
    return out[:wrote]


def decode_only(path) -> tuple[np.ndarray, int] | None:
    """Decode one WAV to mono float32 at its NATIVE rate (no resampling) —
    feeds the on-device polyphase resampler (ops/resample.py). None on
    native-path failure (caller falls back to audio_io.read_wav)."""
    lib = _load()
    if lib is None:
        return None
    path_b = os.fsencode(path)
    sr = ctypes.c_int(0)
    n = ctypes.c_int64(0)
    if lib.asr_wav_info(path_b, ctypes.byref(sr), ctypes.byref(n)) != 0:
        return None
    mono = np.empty(n.value, dtype=np.float32)
    got = lib.asr_wav_decode(
        path_b,
        mono.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.value,
        ctypes.byref(sr),
    )
    if got < 0:
        return None
    return mono[:got], sr.value


def decode_only_batch(paths, max_workers: int | None = None):
    """Threaded decode at native rates -> list of (mono float32, sr)."""

    def fn(p):
        out = decode_only(p)
        if out is None:
            try:
                ch, sr = audio_io.read_wav(p)
            except (ValueError, OSError) as e:
                # surfaced from a worker thread: without the filename a
                # single bad file in a 256-file chunk is hard to identify
                raise ValueError(f"cannot decode audio file {p!r}: {e}")
            mono = ch.mean(axis=0) if ch.shape[0] > 1 else ch[0]
            return mono, sr
        return out

    workers = max_workers or min(32, (os.cpu_count() or 4))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(fn, paths))


def decode_resample_batch(
    paths, target_sr: int = 22050, max_workers: int | None = None
) -> list[np.ndarray]:
    """Threaded batch decode+resample (C calls release the GIL).

    Falls back to the numpy path per-file when the native library is missing.
    """
    def numpy_path(p):
        return audio_io.load_audio(p, target_sr, native=False)[0]

    if available():

        def fn(p):
            out = decode_resample(p, target_sr)
            # on native decode failure, retry on the numpy path so the
            # caller gets a real diagnostic (ValueError naming the file)
            # instead of a None propagating
            if out is None:
                try:
                    return numpy_path(p)
                except (ValueError, OSError) as e:
                    # OSError too: a moved artifact dir raises
                    # FileNotFoundError, which must also name the file
                    raise ValueError(f"cannot decode audio file {p!r}: {e}")
            return out

    else:
        fn = numpy_path
    workers = max_workers or min(32, (os.cpu_count() or 4))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(fn, paths))

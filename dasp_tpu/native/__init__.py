"""ctypes bindings for the native host-runtime library (native/dasp_io.cpp).

The compute path is JAX/XLA/Pallas on the TPU; the host runtime around
it — wav codec, range reads, the thread-pool batch loader, dataset
indexing — is C++ (the reference's torchaudio + DataLoader analogue,
ref auto_eq.py:195, style_transfer.py:401-406). This module builds the
shared library on first use with the system compiler (g++/cc, ~1 s,
cached next to this file) and binds it with ctypes; every caller in
:mod:`dasp_tpu.utils.audio` falls back to the pure-Python path when no
compiler is available or ``DASP_TPU_NO_NATIVE=1``.

Public surface (all return numpy, raise RuntimeError on codec errors):

* :func:`available` — True iff the library is built and loaded.
* :func:`wav_info`  — header-only probe.
* :func:`wav_read`  — range decode -> float32 (channels, frames).
* :func:`wav_write` — float32 (channels, frames) -> 16-bit PCM.
* :func:`load_batch` — thread-pool clip loader -> (batch, ch, frames).
* :func:`chunk_peaks` — streaming per-chunk |peak| for silence indexing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "available", "build", "wav_info", "wav_read", "wav_write",
    "load_batch", "chunk_peaks",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dasp_io.cpp")
_LIB_PATH = os.path.join(_HERE, "_dasp_io.so")
_ABI = 1


def _candidate_lib_dirs() -> list:
    """Places to build/load the .so: package dir first, then a
    user-writable cache dir (read-only site-packages installs)."""
    dirs = [_HERE]
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    dirs.append(os.path.join(cache, "dasp_tpu"))
    return dirs

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compiler() -> Optional[list]:
    for cc in (os.environ.get("CXX"), "g++", "c++", "clang++"):
        if not cc:
            continue
        try:
            subprocess.run([cc, "--version"], capture_output=True, timeout=30)
            return [cc]
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def build(force: bool = False) -> bool:
    """Compile native/dasp_io.cpp into _dasp_io.so next to this file
    (or, when the package dir is read-only, under ~/.cache/dasp_tpu).

    Returns True on success, False on ANY failure — no compiler, no
    writable dir, compile error — so callers always degrade to the
    pure-Python path. Safe to call from multiple threads; the build is
    atomic (compile to a temp file, rename into place).
    """
    global _LIB_PATH
    if os.path.exists(_LIB_PATH) and not force:
        try:  # rebuild only when the packaged source is newer than the .so
            if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
                return True
        except OSError:
            return True
    if not os.path.exists(_SRC):
        return False
    cc = _compiler()
    if cc is None:
        return False
    for lib_dir in _candidate_lib_dirs():
        lib_path = os.path.join(lib_dir, "_dasp_io.so")
        tmp = None
        try:
            if os.path.exists(lib_path) and not force and \
                    os.path.getmtime(lib_path) >= os.path.getmtime(_SRC):
                _LIB_PATH = lib_path
                return True
            os.makedirs(lib_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=lib_dir)
            os.close(fd)
            cmd = cc + ["-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
                        _SRC, "-o", tmp]
            r = subprocess.run(cmd, capture_output=True, timeout=300)
            if r.returncode != 0:
                sys.stderr.write(
                    f"dasp_tpu.native: build failed:\n"
                    f"{r.stderr.decode(errors='replace')}\n")
                os.unlink(tmp)
                return False  # compiler error: retrying elsewhere won't help
            os.replace(tmp, lib_path)  # atomic on POSIX
            _LIB_PATH = lib_path
            return True
        except (OSError, subprocess.TimeoutExpired) as e:
            # Unwritable dir / fs error: try the next candidate dir.
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            last_err = e
    sys.stderr.write(f"dasp_tpu.native: build failed: {last_err}\n")
    return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    f32_p = ctypes.POINTER(ctypes.c_float)
    i64_p = ctypes.POINTER(ctypes.c_int64)
    i32_p = ctypes.POINTER(ctypes.c_int32)
    lib.dasp_abi_version.restype = ctypes.c_int
    lib.dasp_strerror.restype = ctypes.c_char_p
    lib.dasp_strerror.argtypes = [ctypes.c_int]
    lib.dasp_wav_info.restype = ctypes.c_int
    lib.dasp_wav_info.argtypes = [ctypes.c_char_p, i32_p, i32_p, i64_p, i32_p, i32_p]
    lib.dasp_wav_read.restype = ctypes.c_int64
    lib.dasp_wav_read.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int32]
    lib.dasp_wav_write.restype = ctypes.c_int
    lib.dasp_wav_write.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int32,
                                   ctypes.c_int64, ctypes.c_int32]
    lib.dasp_load_batch.restype = ctypes.c_int
    lib.dasp_load_batch.argtypes = [c_char_pp, i64_p, ctypes.c_int32,
                                    ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32, f32_p, ctypes.c_int32]
    lib.dasp_chunk_peaks.restype = ctypes.c_int64
    lib.dasp_chunk_peaks.argtypes = [ctypes.c_char_p, ctypes.c_int64, f32_p,
                                     ctypes.c_int64]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("DASP_TPU_NO_NATIVE") == "1":
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.dasp_abi_version() != _ABI:  # stale cached .so
                if not build(force=True):
                    return None
                lib = ctypes.CDLL(_LIB_PATH)
            _lib = _bind(lib)
        except OSError as e:
            sys.stderr.write(f"dasp_tpu.native: load failed: {e}\n")
            return None
    return _lib


def available() -> bool:
    """True iff the native library is built, loaded and ABI-compatible."""
    return _get() is not None


def _check(lib: ctypes.CDLL, code: int, path: str) -> None:
    if code < 0:
        msg = lib.dasp_strerror(int(code)).decode()
        raise RuntimeError(f"dasp_tpu.native: {msg}: {path!r}")


def wav_info(path: str) -> Tuple[int, int, int, int, bool]:
    """-> (sample_rate, channels, num_frames, bits, is_float)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    nf = ctypes.c_int64()
    bits = ctypes.c_int32()
    isf = ctypes.c_int32()
    rc = lib.dasp_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(nf), ctypes.byref(bits), ctypes.byref(isf))
    _check(lib, rc, path)
    return sr.value, ch.value, nf.value, bits.value, bool(isf.value)


def wav_read(path: str, offset: int = 0, frames: Optional[int] = None,
             channels: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Range-decode -> (float32 (channels, frames), sample_rate).

    Reads exactly the requested byte range (one header parse + one
    seek + one read); frames past EOF are zero-filled.
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr, file_ch, nf, _, _ = wav_info(path)
    if frames is None:
        frames = max(0, nf - offset)
    if channels is None or channels <= 0 or channels > file_ch:
        channels = file_ch
    out = np.empty((channels, frames), dtype=np.float32)
    rc = lib.dasp_wav_read(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           int(offset), int(frames), int(channels))
    _check(lib, int(rc), path)
    return out, sr


def wav_write(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 (channels, frames) (or (frames,)) as 16-bit PCM."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    audio = np.ascontiguousarray(np.atleast_2d(np.asarray(audio, np.float32)))
    rc = lib.dasp_wav_write(path.encode(),
                            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            int(audio.shape[0]), int(audio.shape[1]),
                            int(sample_rate))
    _check(lib, rc, path)


def load_batch(examples: Sequence[Tuple[str, int]], frames: int,
               channels: int = 1, mono_mix: bool = True,
               num_threads: int = 0) -> np.ndarray:
    """Thread-pool clip loader -> float32 (batch, channels, frames).

    Each clip i is frames [offset_i, offset_i + frames) of file i —
    mono-mixed over source channels (duplicated across output channels)
    when ``mono_mix``, else the first ``channels`` channels. The pool
    runs entirely outside the GIL. ``num_threads=0`` uses the hardware
    count.
    """
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    batch = len(examples)
    out = np.empty((batch, channels, frames), dtype=np.float32)
    if batch == 0:
        return out
    path_bytes = [p.encode() for p, _ in examples]
    c_paths = (ctypes.c_char_p * batch)(*path_bytes)
    c_offsets = (ctypes.c_int64 * batch)(*[int(o) for _, o in examples])
    rc = lib.dasp_load_batch(c_paths, c_offsets, batch, int(frames),
                             int(channels), 1 if mono_mix else 0,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             int(num_threads))
    # The C side reports the first error code across the pool, not which
    # file raised it; say so rather than blaming examples[0].
    _check(lib, rc, f"one of {batch} files (first: {examples[0][0]!r})")
    return out


def chunk_peaks(path: str, chunk_frames: int) -> np.ndarray:
    """Streaming per-chunk |peak| (max over all channels) -> (num_chunks,)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    _, _, nf, _, _ = wav_info(path)
    n = max(0, nf // int(chunk_frames))
    out = np.empty((n,), dtype=np.float32)
    if n == 0:
        return out
    rc = lib.dasp_chunk_peaks(path.encode(), int(chunk_frames),
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                              int(n))
    _check(lib, int(rc), path)
    return out

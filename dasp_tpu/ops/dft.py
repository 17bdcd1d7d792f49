"""Real DFTs as dense matmuls — the fast spectral path for small
transforms on TPU.

XLA lowers small batched FFTs on TPU to a long chain of
reshape/transpose/fusion sub-ops running far off the hardware roofline,
while a dense fp32 ``frames @ basis`` matmul runs on the MXU at near
peak. Measured on a v5e at the training workload, routing the MR-STFT
loss's (512, 1024, 2048)-point transforms through matmuls is a +3.7%
whole-step win; the WOLA machinery (ops.tv_filter) uses the same path.

Three entry points, all exact (fp32 ``Precision.HIGHEST``; bases built
in float64 and cached per size):

* :func:`rdft` — rfft of real frames, returned as a (re, im) pair.
* :func:`irdft` — irfft back to real time frames from (re, im).
* :func:`prefer_dft` — the backend/size decision shared by the loss and
  the WOLA ops.

The matmul framing also never zero-pads: a frame of length L transformed
at n_fft > L multiplies an (L, n_bins) basis — the padded samples would
contribute zeros — so analysis at n_fft == 2*frame_size does half the
work of the padded FFT.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["prefer_dft", "rdft", "irdft"]

# Above this size the O(n^2) matmul loses to the O(n log n) FFT
# (measured on v5e: clear wins at 1024-2048 — phaser grad 35->21 ms, auto_wah
# 51->36 ms, whole-step loss +3.7% — but mixed at 4096, where spectral_gate
# regressed 65->70 ms; the loss and WOLA ops use 512-4096).
DFT_MATMUL_MAX_N = 2048

_FWD_CACHE: dict = {}
_INV_CACHE: dict = {}


def prefer_dft(n_fft: int, cpu_fallback: bool = False) -> bool:
    """Should this transform run as matmuls on the current backend?

    TPU: yes up to ``DFT_MATMUL_MAX_N`` (MXU beats the fft lowering).
    CPU: only when ``cpu_fallback`` — the O(n^2) path is slower there but
    layout-agnostic (XLA-CPU's fft thunk RET-CHECKs row-major operands,
    which layout assignment violates around shard_map regions).
    """
    backend = jax.default_backend()
    if backend == "tpu":
        return n_fft <= DFT_MATMUL_MAX_N
    if backend == "cpu":
        return bool(cpu_fallback)
    return False


def _fwd_bases(frame_len: int, n: int) -> Tuple[np.ndarray, np.ndarray]:
    key = (frame_len, n)
    if key not in _FWD_CACHE:
        m = np.arange(frame_len, dtype=np.float64)[:, None]
        k = np.arange(n // 2 + 1, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * m * k / n
        _FWD_CACHE[key] = (np.cos(ang).astype(np.float32),
                           (-np.sin(ang)).astype(np.float32))
    return _FWD_CACHE[key]


def _inv_bases(n: int) -> Tuple[np.ndarray, np.ndarray]:
    if n not in _INV_CACHE:
        k = np.arange(n // 2 + 1, dtype=np.float64)[:, None]
        t = np.arange(n, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * k * t / n
        # bin weights of the c2r inverse: interior bins count twice
        # (conjugate pair), DC and (even-n) Nyquist once; the sin rows of
        # DC/Nyquist are identically zero, so imaginary parts there drop
        # out exactly as in irfft
        w = np.full((n // 2 + 1, 1), 2.0 / n)
        w[0] = 1.0 / n
        if n % 2 == 0:
            w[-1] = 1.0 / n
        _INV_CACHE[n] = ((w * np.cos(ang)).astype(np.float32),
                         (-w * np.sin(ang)).astype(np.float32))
    return _INV_CACHE[n]


def rdft(frames: jnp.ndarray, n_fft: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rfft of real ``frames`` (..., L) at size ``n_fft >= L`` as two
    matmuls -> (re, im), each (..., n_fft//2 + 1)."""
    cos_b, sin_b = _fwd_bases(frames.shape[-1], n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b),
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b),
                    precision=jax.lax.Precision.HIGHEST)
    return re, im


def irdft(re: jnp.ndarray, im: jnp.ndarray, n_fft: Optional[int] = None) -> jnp.ndarray:
    """irfft from (re, im) of shape (..., n_bins) -> real (..., n_fft)."""
    if n_fft is None:
        n_fft = 2 * (re.shape[-1] - 1)
    cos_b, sin_b = _inv_bases(n_fft)
    return (jnp.matmul(re, jnp.asarray(cos_b), precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(im, jnp.asarray(sin_b), precision=jax.lax.Precision.HIGHEST))

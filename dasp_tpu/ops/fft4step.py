"""Long FFT convolutions as 4-step Cooley-Tukey with MXU matmul stages.

XLA-TPU lowers a long 1-D FFT (the reverb conv needs 196608-point
transforms: T + K - 1 = 131072 + 65536 - 1, dasp_pytorch/functional.py:570
convolves a 65536-tap IR) into a deep chain of small-radix stages that
runs far off the roofline ("FFT-decomposition bound" in the step
profile). ops/dft.py already routes *small* transforms (<= 2048) through
dense DFT matmuls at a measured win; this module extends the idea to
arbitrary composite lengths with the classic four-step decomposition
(Bailey 1990, public algorithm):

    N = N1 * N2, n = n1*N2 + n2, k = k1 + N1*k2:
    X[k1 + N1*k2] = sum_{n2} W_N^{n2*k1}
                    (sum_{n1} x[n1*N2 + n2] W_{N1}^{n1*k1}) W_{N2}^{n2*k2}

i.e. reshape to (N1, N2) -> dense N1-DFT down the columns (one matmul)
-> twiddle (elementwise) -> dense N2-DFT along the rows (one matmul).
With N1, N2 <= 2048 both stages are MXU-sized fp32 matmuls at
``Precision.HIGHEST``; total work is O(N * (N1 + N2)) MACs, a constant
factor above O(N log N) but at near-peak MXU throughput instead of the
fft thunk's scalar-ish lowering.

For *convolution* the spectrum's output ordering is irrelevant — the
pointwise product only needs both operands in the SAME ordering and the
inverse pipeline to be the exact stage-by-stage inverse — so spectra
stay in the "scrambled" (k1, k2) layout and the final digit-reversal
transpose of the textbook algorithm is skipped entirely.

Everything is plain einsum/elementwise, so jit/vmap/grad compose; the
VJP is the same matmuls transposed (also MXU). Bases are built in
float64 once per size and cached as numpy (fp32 on device).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["good_split", "prefer_fft4", "fft_mul_mxu"]

_HIGH = jax.lax.Precision.HIGHEST

# Stage sizes are capped where dense DFT matmuls stay efficient (same
# regime ops/dft.py measured; beyond it the O(N*(N1+N2)) constant grows
# past what the MXU buys back).
MAX_STAGE = 2048
# Below this the single-matmul rdft path / XLA's fft are already fine.
MIN_TOTAL = 8192

_SPLIT_CACHE: dict = {}
_STAGE_CACHE: dict = {}
_TWIDDLE_CACHE: dict = {}


def good_split(n: int, max_stage: int = MAX_STAGE) -> Optional[Tuple[int, int]]:
    """Factor ``n = N1 * N2`` with both stages MXU-sized, or None.

    Picks the divisor pair minimizing ``N1 + N2`` (the matmul MAC count
    is ``n * (N1 + N2)``), preferring 8-divisible stages (TPU-friendly
    tiling) among equal sums. N1 is the smaller factor.
    """
    key = (int(n), int(max_stage))
    if key in _SPLIT_CACHE:
        return _SPLIT_CACHE[key]
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            a, b = d, n // d
            if a >= 8 and b <= max_stage:
                score = (a + b, (a % 8 != 0) + (b % 8 != 0))
                if best is None or score < best[0]:
                    best = (score, (a, b))
        d += 1
    out = best[1] if best is not None else None
    _SPLIT_CACHE[key] = out
    return out


def prefer_fft4(n_fft: int) -> bool:
    """Route this transform length through the 4-step MXU path?

    TPU only; needs a factorization with both stages <= ``MAX_STAGE``
    and a length where the XLA fft lowering is the measured loser.
    ``DASP_DISABLE_FFT4=1`` in the environment forces the XLA fft path
    (perf-triage kill-switch; checked at trace time).
    """
    if os.environ.get("DASP_DISABLE_FFT4", "") == "1":
        return False
    return (jax.default_backend() == "tpu" and n_fft >= MIN_TOTAL
            and good_split(n_fft) is not None)


def _stage_mats(N: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of the dense N-point DFT matrix M[k, n] = W_N^{±kn}.

    Forward: W = exp(-2πi kn/N) -> (cos, -sin). Inverse: conj / N.
    """
    key = (N, inverse)
    if key not in _STAGE_CACHE:
        k = np.arange(N, dtype=np.float64)[:, None]
        n = np.arange(N, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * k * n / N
        if inverse:
            re, im = np.cos(ang) / N, np.sin(ang) / N
        else:
            re, im = np.cos(ang), -np.sin(ang)
        _STAGE_CACHE[key] = (re.astype(np.float32), im.astype(np.float32))
    return _STAGE_CACHE[key]


def _twiddles(N1: int, N2: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of W_N^{±k1*n2}, shape (N1, N2)."""
    key = (N1, N2, inverse)
    if key not in _TWIDDLE_CACHE:
        k1 = np.arange(N1, dtype=np.float64)[:, None]
        n2 = np.arange(N2, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * k1 * n2 / (N1 * N2)
        sgn = 1.0 if inverse else -1.0
        _TWIDDLE_CACHE[key] = (np.cos(ang).astype(np.float32),
                               (sgn * np.sin(ang)).astype(np.float32))
    return _TWIDDLE_CACHE[key]


def _mat_axis2(m_re, m_im, a_re, a_im):
    """Complex contraction over axis -2: out[.., k, m] = Σ_n M[k,n] A[.., n, m]."""
    mr, mi = jnp.asarray(m_re), jnp.asarray(m_im)
    br = jnp.einsum("kn,...nm->...km", mr, a_re, precision=_HIGH)
    bi = jnp.einsum("kn,...nm->...km", mi, a_re, precision=_HIGH)
    if a_im is not None:
        br = br - jnp.einsum("kn,...nm->...km", mi, a_im, precision=_HIGH)
        bi = bi + jnp.einsum("kn,...nm->...km", mr, a_im, precision=_HIGH)
    return br, bi


def _mat_axis1(a_re, a_im, m_re, m_im, real_output: bool = False):
    """Complex contraction over the last axis: out[.., k, m] = Σ_n A[.., k, n] M[n, m]."""
    mr, mi = jnp.asarray(m_re), jnp.asarray(m_im)
    br = jnp.einsum("...kn,nm->...km", a_re, mr, precision=_HIGH)
    if a_im is not None:
        br = br - jnp.einsum("...kn,nm->...km", a_im, mi, precision=_HIGH)
    if real_output:
        return br, None
    bi = jnp.einsum("...kn,nm->...km", a_re, mi, precision=_HIGH)
    if a_im is not None:
        bi = bi + jnp.einsum("...kn,nm->...km", a_im, mr, precision=_HIGH)
    return br, bi


def _fwd_scrambled(x: jnp.ndarray, N1: int, N2: int):
    """Forward DFT of real ``x`` (..., N1*N2) -> scrambled (k1, k2) spectra."""
    a = x.reshape(x.shape[:-1] + (N1, N2))
    m1 = _stage_mats(N1, inverse=False)
    br, bi = _mat_axis2(m1[0], m1[1], a, None)  # N1-DFT over n1
    tw_re, tw_im = _twiddles(N1, N2, inverse=False)
    tr, ti = jnp.asarray(tw_re), jnp.asarray(tw_im)
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    m2 = _stage_mats(N2, inverse=False)
    return _mat_axis1(cr, ci, m2[0], m2[1])  # N2-DFT over n2


def _inv_scrambled(y_re: jnp.ndarray, y_im: jnp.ndarray, N1: int, N2: int):
    """Exact inverse of :func:`_fwd_scrambled`; returns real (..., N1*N2)."""
    m2 = _stage_mats(N2, inverse=True)
    br, bi = _mat_axis1(y_re, y_im, m2[0], m2[1])  # undo the N2-DFT
    tw_re, tw_im = _twiddles(N1, N2, inverse=True)  # conjugate twiddles
    tr, ti = jnp.asarray(tw_re), jnp.asarray(tw_im)
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    m1_re, m1_im = _stage_mats(N1, inverse=True)
    # final stage: the time-domain output of a real*real convolution is
    # real, so only Re(M1 @ (cr + i ci)) = M1_re@cr - M1_im@ci is needed
    # — two matmuls instead of four.
    out = (jnp.einsum("kn,...nm->...km", jnp.asarray(m1_re), cr,
                      precision=_HIGH)
           - jnp.einsum("kn,...nm->...km", jnp.asarray(m1_im), ci,
                        precision=_HIGH))
    return out.reshape(out.shape[:-2] + (N1 * N2,))


def fft_mul_mxu(x: jnp.ndarray, h: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Circular convolution of real ``x`` and ``h`` at length ``n_fft``
    via scrambled-layout 4-step MXU transforms.

    Drop-in for ``irfft(rfft(x, n) * rfft(h, n), n)`` (ops/fir.py:23-26):
    same zero-padding semantics, same (..., n_fft) real output, leading
    axes broadcast. fp32 ``Precision.HIGHEST`` throughout.
    """
    split = good_split(n_fft)
    assert split is not None, f"no MXU split for n_fft={n_fft}"
    N1, N2 = split
    dtype = jnp.result_type(x.dtype, h.dtype)

    def pad_to(a):
        a = a.astype(jnp.float32)
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n_fft - a.shape[-1])])

    xr, xi = _fwd_scrambled(pad_to(x), N1, N2)
    hr, hi = _fwd_scrambled(pad_to(h), N1, N2)
    yr = xr * hr - xi * hi
    yi = xr * hi + xi * hr
    return _inv_scrambled(yr, yi, N1, N2).astype(dtype)

"""Banded fractional-delay Pallas kernel (ops/pallas_interp.py) vs the
fused-einsum XLA path — values and all three cotangents, in interpreter
mode on CPU. Test delays carry an irrational offset so no read position
lands exactly on an interpolation kink (at exact kinks the two paths
use different — equally valid — subgradient conventions; see
test_kink_subgradient_convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu.functional as F
from dasp_tpu.ops.pallas_interp import frac_delay_pallas

RNG = np.random.default_rng(0)
B, Dm, CHUNK = 128, 896, 4
EPS_IRR = 0.0078125 / 3.0  # kink-avoiding offset


def _setup(bs=2, chs=2, T=2048):
    nb = -(-T // B)
    Tp = nb * B
    x = jnp.asarray(RNG.standard_normal((bs, chs, T)).astype(np.float32) * 0.3)
    x_ext = jnp.pad(x, ((0, 0), (0, 0), (Dm, Tp - T)))
    return x_ext, Tp, bs


def _compare(x_ext, d_stk, g_stk, atol=3e-6):
    f_ad = jax.jit(lambda xe, d, g: jnp.sum(jnp.sin(
        F._frac_delay_tiles_ad(B, Dm, xe, d, g, chunk=CHUNK))))
    f_pl = jax.jit(lambda xe, d, g: jnp.sum(jnp.sin(
        frac_delay_pallas(xe, d, g, B, Dm, True))))
    va, vp = f_ad(x_ext, d_stk, g_stk), f_pl(x_ext, d_stk, g_stk)
    assert abs(float(va - vp)) < 2e-5
    ga = jax.jit(jax.grad(f_ad, argnums=(0, 1, 2)))(x_ext, d_stk, g_stk)
    gp = jax.jit(jax.grad(f_pl, argnums=(0, 1, 2)))(x_ext, d_stk, g_stk)
    for name, a, b in zip(("dx", "dd", "dg"), ga, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                                   err_msg=name)


class TestFracDelayPallas:
    def test_sawtooth_wrap_taps(self):
        """Pitch-shifter-style wrapping sawtooth delays: the bimodal
        read-position blocks exercise the gated max-anchored rows."""
        x_ext, Tp, bs = _setup()
        n = np.arange(Tp, dtype=np.float32)[None, :]
        W = float(Dm - 2)
        d, g = [], []
        for slope, off in ((0.4, 0.0), (-0.3, 0.5)):
            p = (slope * n / W + off + EPS_IRR) % 1.0
            d.append(np.broadcast_to(W * p, (bs, Tp)).astype(np.float32))
            g.append(np.broadcast_to(np.sin(np.pi * p), (bs, Tp)).astype(np.float32))
        _compare(x_ext, jnp.asarray(np.stack(d)), jnp.asarray(np.stack(g)))

    def test_lfo_delay(self):
        x_ext, Tp, bs = _setup()
        n = np.arange(Tp, dtype=np.float32)[None, :]
        lfo = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * n / 44100.0))
        dly = np.broadcast_to(20.0 + EPS_IRR + (Dm - 42.0) * lfo, (bs, Tp))
        _compare(x_ext, jnp.asarray(dly[None].astype(np.float32).copy()),
                 jnp.asarray(np.ones((1, bs, Tp), np.float32)))

    def test_edges_mask_and_full_range(self):
        """Delay sweeping the full [0, Dm-1] range: exercises the t < d
        zero mask and both window extremes."""
        x_ext, Tp, bs = _setup()
        dly = np.broadcast_to(
            np.linspace(Dm - 1.2, EPS_IRR, Tp, dtype=np.float32), (bs, Tp))
        _compare(x_ext, jnp.asarray(dly[None].copy()),
                 jnp.asarray(np.full((1, bs, Tp), 0.7, np.float32)))

    def test_kink_subgradient_convention(self):
        """At EXACT integer read positions the hat is non-differentiable;
        the kernel uses sign(0)=0 while XLA's maximum-tie rule splits the
        cotangent. Values must still agree exactly; only dd may differ at
        the kink samples."""
        x_ext, Tp, bs = _setup()
        dly = np.full((1, bs, Tp), 100.0, np.float32)  # exact integer
        g = np.ones((1, bs, Tp), np.float32)
        wa = F._frac_delay_tiles_ad(B, Dm, x_ext, jnp.asarray(dly),
                                    jnp.asarray(g), chunk=CHUNK)
        wp = frac_delay_pallas(x_ext, jnp.asarray(dly), jnp.asarray(g),
                               B, Dm, True)
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wp), atol=1e-6)

    def test_pitch_shift_adjoint_pallas_matches_ad(self):
        """Through the public API: pitch_shift(adjoint='pallas') equals
        adjoint='ad' in value and gradients (interpret mode; on TPU the
        kernel is the 'auto' default)."""
        SR = 44100
        x = jnp.asarray(RNG.standard_normal((2, 2, 4096)).astype(np.float32) * 0.3)
        st = jnp.asarray(np.float32([3.1, -5.2]))
        mix = jnp.asarray(np.float32([0.8, 0.6]))

        def g(adj):
            return jax.jit(jax.grad(
                lambda x, st, mix: jnp.mean(F.pitch_shift(
                    x, SR, st, mix, window_ms=10.0, block=128,
                    adjoint=adj) ** 2),
                argnums=(0, 1, 2)))(x, st, mix)

        ga, gp = g("ad"), g("pallas")
        for name, a, b in zip(("dx", "dst", "dmix"), ga, gp):
            # the semitones grad is an ill-conditioned fp32 reduction
            # (BOTH fp32 paths sit ~1e-1 relative from float64); this
            # is an equality smoke at fp32-noise tolerance, not a
            # precision claim
            scale = max(float(jnp.abs(a).max()), 1e-9)
            np.testing.assert_allclose(np.asarray(b) / scale,
                                       np.asarray(a) / scale, atol=3e-4,
                                       err_msg=name)

    def test_modulated_delay_adjoint_pallas_matches_ad(self):
        SR = 44100
        x = jnp.asarray(RNG.standard_normal((2, 1, 4096)).astype(np.float32) * 0.3)
        args = tuple(jnp.full((2,), v) for v in (1.7, 6.0, 11.0, 0.8))

        def g(adj):
            return jax.jit(jax.grad(
                lambda x: jnp.mean(F.modulated_delay(
                    x, SR, *args, max_delay_ms=20.0, block=128,
                    adjoint=adj) ** 2)))(x)

        np.testing.assert_allclose(np.asarray(g("pallas")),
                                   np.asarray(g("ad")), atol=1e-6)

"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import dasp_tpu as D
from dasp_tpu.ops import fft_conv_causal
from dasp_tpu.ops.biquad import biquad
from dasp_tpu.ops.iir import sosfilt_coupled
from dasp_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    sharded_fft_conv_causal,
    sharded_sosfilt_coupled,
)

SR = 44100
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestShardedConv:
    def test_matches_unsharded(self, devices_ok):
        mesh = make_mesh((1, 8))
        x = jnp.asarray(RNG.standard_normal((2, 2, 4096)).astype(np.float32))
        h = jnp.asarray(RNG.standard_normal((2, 2, 256)).astype(np.float32))
        y_ref = fft_conv_causal(x, h)
        y = sharded_fft_conv_causal(x, h, mesh)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_sp2_with_dp(self, devices_ok):
        mesh = make_mesh((4, 2))
        x = jnp.asarray(RNG.standard_normal((4, 2, 2048)).astype(np.float32))
        h = jnp.asarray(RNG.standard_normal((4, 2, 512)).astype(np.float32))
        y_ref = fft_conv_causal(x, h)
        y = sharded_fft_conv_causal(x, h, mesh)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_one_tap_ir(self, devices_ok):
        """Regression: halo = K-1 = 0 made the -halo tail slice send the
        whole block through ppermute and broke the output shape."""
        mesh = make_mesh((1, 8))
        x = jnp.asarray(RNG.standard_normal((1, 2, 1024)).astype(np.float32))
        h = jnp.full((1, 2, 1), 0.25, jnp.float32)
        y = sharded_fft_conv_causal(x, h, mesh)
        np.testing.assert_allclose(np.asarray(y), 0.25 * np.asarray(x), atol=1e-6)

    def test_direct_conv_carries_highest_precision(self):
        """Lowered-HLO guard: the direct grouped-conv body claims
        bit-compatibility with the fp32 FFT path, so its convolution must
        pin HIGHEST precision (TPU convs default to bf16)."""
        import re

        from dasp_tpu.parallel.sharded import _direct_causal_conv

        x = jnp.zeros((2, 2, 1024))
        h = jnp.zeros((2, 2, 64))
        txt = jax.jit(_direct_causal_conv).lower(x, h).as_text()
        convs = re.findall(r"stablehlo\.convolution.*", txt)
        assert convs
        bad = [c for c in convs
               if c.count("#stablehlo<precision HIGHEST>") != 2]
        assert not bad, bad[0][:200]

    def test_rejects_too_long_ir(self, devices_ok):
        mesh = make_mesh((1, 8))
        x = jnp.zeros((1, 1, 1024))
        h = jnp.zeros((1, 1, 512))  # halo 511 > block 128
        with pytest.raises(AssertionError, match="halo"):
            sharded_fft_conv_causal(x, h, mesh)


class TestShardedIIR:
    """Sequence-sharded exact recurrence: each device filters its time
    shard from rest; a per-section all_gather of tiny affine state maps
    reconstructs the true incoming state (ops.iir.sosfilt_coupled's
    seq_axis_name path)."""

    def _sos(self, bs):
        secs = []
        for g, fc, q, ft in [
            (4.0, 200.0, 0.7, "low_shelf"),
            (6.0, 40.0, 2.0, "peaking"),  # near-unit-circle resonant band
            (-6.0, 1000.0, 2.0, "peaking"),
            (3.0, 8000.0, 0.7, "high_shelf"),
        ]:
            b, a = biquad(jnp.full((bs,), g), jnp.full((bs,), fc),
                          jnp.full((bs,), q), SR, ft)
            secs.append(jnp.concatenate([b, a], axis=-1))
        return jnp.stack(secs, axis=1)

    def test_matches_unsharded(self, devices_ok):
        mesh = make_mesh((1, 8))
        bs = 2
        sos = self._sos(bs)
        x = jnp.asarray(RNG.standard_normal((bs, 2, 8192)).astype(np.float32) * 0.3)
        y_ref = sosfilt_coupled(sos, x)
        y = jax.jit(lambda s, x: sharded_sosfilt_coupled(s, x, mesh))(sos, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-4)

    def test_gradients_match_unsharded(self, devices_ok):
        mesh = make_mesh((1, 8))
        bs = 2
        sos = self._sos(bs)
        x = jnp.asarray(RNG.standard_normal((bs, 1, 2048)).astype(np.float32) * 0.3)
        g_sh = jax.jit(jax.grad(
            lambda s, x: jnp.mean(sharded_sosfilt_coupled(s, x, mesh) ** 2),
            argnums=(0, 1)))(sos, x)
        g_rf = jax.grad(
            lambda s, x: jnp.mean(sosfilt_coupled(s, x) ** 2), argnums=(0, 1))(sos, x)
        np.testing.assert_allclose(np.asarray(g_sh[1]), np.asarray(g_rf[1]), atol=1e-5)
        scale = np.abs(np.asarray(g_rf[0])).max()
        np.testing.assert_allclose(
            np.asarray(g_sh[0]) / scale, np.asarray(g_rf[0]) / scale, atol=1e-2)

    def test_rejects_unaligned(self, devices_ok):
        mesh = make_mesh((1, 8))
        with pytest.raises(AssertionError, match="divisible"):
            sharded_sosfilt_coupled(self._sos(1), jnp.zeros((1, 1, 8000)), mesh)


class TestShardedBallistics:
    """Sequence-sharded dynamics smoothing: per-shard one-pole scans from
    rest plus a tiny all_gather of affine state maps — the compressor/
    expander/limiter envelope stage no longer idles the sp axis."""

    def _curve(self, bs=2, T=8192):
        # a gain-reduction-like curve: mostly 0 with negative dips
        g = -np.abs(RNG.standard_normal((bs, 1, T))).astype(np.float32) * 6.0
        aa = np.float32([0.93, 0.999][:bs]).reshape(bs, 1, 1)
        ar = np.float32([0.9995, 0.99][:bs]).reshape(bs, 1, 1)
        return jnp.asarray(g), jnp.asarray(aa), jnp.asarray(ar)

    def test_onepole_matches_unsharded(self, devices_ok):
        from dasp_tpu.ops.iir import onepole_exact
        from dasp_tpu.parallel import sharded_onepole

        mesh = make_mesh((1, 8))
        g, aa, _ = self._curve()
        y_ref = onepole_exact(g, aa)
        y = jax.jit(lambda g, a: sharded_onepole(g, a, mesh))(g, aa)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-4)

    @pytest.mark.parametrize("shape", [(1, 8), (4, 2)])
    def test_parallel_mode_matches_unsharded(self, devices_ok, shape):
        from dasp_tpu.ops.iir import ballistics_smooth
        from dasp_tpu.parallel import sharded_ballistics_smooth

        mesh = make_mesh(shape)
        bs = max(2, shape[0])
        g, aa, ar = self._curve(bs=2, T=8192)
        g = jnp.tile(g, (bs // 2, 1, 1))
        aa, ar = jnp.tile(aa, (bs // 2, 1, 1)), jnp.tile(ar, (bs // 2, 1, 1))
        y_ref = ballistics_smooth(g, aa, ar, mode="parallel")
        b = "dp" if shape[0] > 1 else None
        y = jax.jit(lambda g, a, r: sharded_ballistics_smooth(
            g, a, r, mesh, mode="parallel", batch_axis_name=b))(g, aa, ar)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-4)

    def test_gradients_match_unsharded(self, devices_ok):
        from dasp_tpu.ops.iir import ballistics_smooth
        from dasp_tpu.parallel import sharded_ballistics_smooth

        mesh = make_mesh((1, 8))
        g, aa, ar = self._curve(T=2048)

        def loss_sh(g, aa, ar):
            return jnp.mean(sharded_ballistics_smooth(
                g, aa, ar, mesh, mode="parallel") ** 2)

        def loss_rf(g, aa, ar):
            return jnp.mean(ballistics_smooth(g, aa, ar, mode="parallel") ** 2)

        gs = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(g, aa, ar)
        gr = jax.grad(loss_rf, argnums=(0, 1, 2))(g, aa, ar)
        for a, b in zip(gs, gr):
            scale = max(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=5e-4)

    def test_compressor_with_sharded_smoother(self, devices_ok):
        """functional._smooth_gain's callable injection point: the full
        compressor with the default sp-sharded smoother now equals the
        single-chip default smoother='exact_pallas' (the round-5 numerics
        unification — an sp>1 run trains through the SAME exact dynamics
        as the same script on one chip)."""
        from functools import partial

        from dasp_tpu.parallel import sharded_ballistics_smooth

        mesh = make_mesh((1, 8))
        x = jnp.asarray(RNG.standard_normal((2, 2, 8192)).astype(np.float32) * 0.3)
        kw = dict(threshold_db=-24.0, ratio=4.0, attack_ms=5.0,
                  release_ms=80.0, knee_db=6.0, makeup_gain_db=0.0)
        y_ref = D.functional.compressor(x, SR, smoother="exact_pallas", **kw)
        y = jax.jit(lambda x: D.functional.compressor(
            x, SR, smoother=partial(sharded_ballistics_smooth, mesh=mesh),
            **kw))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("shape,mode", [
        ((1, 8), "exact_pallas"), ((4, 2), "exact_pallas"), ((1, 8), "exact"),
    ])
    def test_exact_modes_match_unsharded(self, devices_ok, shape, mode):
        """The sequence-sharded EXACT relay (state handoff over the sp
        ring) is bitwise equal to the unsharded branching kernels — the
        single-/multi-chip dynamics numerics are unified (round-5)."""
        from dasp_tpu.ops.iir import ballistics_smooth
        from dasp_tpu.ops.pallas_ballistics import ballistics_pallas
        from dasp_tpu.parallel import sharded_ballistics_smooth

        mesh = make_mesh(shape)
        bs = max(2, shape[0])
        g, aa, ar = self._curve(bs=2, T=4096)
        g = jnp.tile(g, (bs // 2, 1, 1))
        aa, ar = jnp.tile(aa, (bs // 2, 1, 1)), jnp.tile(ar, (bs // 2, 1, 1))
        if mode == "exact_pallas":
            y_ref = jax.jit(lambda g: ballistics_pallas(g, aa, ar))(g)
        else:
            y_ref = ballistics_smooth(g, aa, ar, mode="exact")
        b = "dp" if shape[0] > 1 else None
        y = jax.jit(lambda g, a, r: sharded_ballistics_smooth(
            g, a, r, mesh, mode=mode, batch_axis_name=b))(g, aa, ar)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=0, atol=1e-7)

    def test_exact_relay_gradients_match_unsharded(self, devices_ok):
        """Gradients through the sharded exact relay (ppermute state
        handoff) equal the unsharded exact kernel's gradients."""
        from dasp_tpu.ops.pallas_ballistics import ballistics_pallas
        from dasp_tpu.parallel import sharded_ballistics_smooth

        mesh = make_mesh((1, 8))
        g, aa, ar = self._curve(T=2048)

        def loss_sh(g, aa, ar):
            return jnp.mean(sharded_ballistics_smooth(g, aa, ar, mesh) ** 2)

        def loss_rf(g, aa, ar):
            return jnp.mean(ballistics_pallas(g, aa, ar) ** 2)

        gs = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(g, aa, ar)
        gr = jax.jit(jax.grad(loss_rf, argnums=(0, 1, 2)))(g, aa, ar)
        for a, b in zip(gs, gr):
            scale = max(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=1e-6)


class TestDataParallelTraining:
    def test_dp_step_matches_single_device(self, devices_ok):
        """A jitted Adam step on dp-sharded data reproduces the single-device
        step (gradient psum over the mesh is handled by XLA)."""
        mesh = make_mesh((8, 1))
        bs, T = 8, 2048
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.25)
        target_drive = jnp.full((bs,), 14.0)
        y_target = D.distortion(x, SR, target_drive)

        opt = optax.adam(0.05)

        def loss_fn(drive, x, y):
            return jnp.mean((D.distortion(x, SR, jnp.broadcast_to(drive, (x.shape[0],))) - y) ** 2)

        def step(drive, opt_state, x, y):
            loss, g = jax.value_and_grad(loss_fn)(drive, x, y)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(drive, upd), opt_state, loss

        # single device
        drive1 = jnp.asarray(0.0)
        st1 = opt.init(drive1)
        step_j = jax.jit(step)
        for _ in range(5):
            drive1, st1, loss1 = step_j(drive1, st1, x, y_target)

        # 8-way dp
        xs = shard_batch(x, mesh)
        ys = shard_batch(y_target, mesh)
        drive8 = jax.device_put(jnp.asarray(0.0), jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        st8 = replicate(opt.init(drive8), mesh)
        for _ in range(5):
            drive8, st8, loss8 = step_j(drive8, st8, xs, ys)

        np.testing.assert_allclose(float(drive8), float(drive1), atol=1e-5)
        np.testing.assert_allclose(float(loss8), float(loss1), atol=1e-6)

    def test_dpsp_step_matches_dp_only(self, devices_ok):
        """The FULL dp x sp style-transfer train step — EQ recurrence AND
        reverb IR conv both sequence-sharded — produces the same loss and
        gradients as the dp-only step at equal shapes (VERDICT r1 #2).

        Both configs use identical numerics (coupled EQ, scan-smoothed
        compressor, time-domain noise, DFT-matmul loss); the only
        difference is whether the EQ/reverb evaluate sharded over sp.
        """
        from functools import partial

        from dasp_tpu.models import StyleTransferNet, make_style_processors
        from dasp_tpu.utils import multi_resolution_stft_loss

        bs, half, reverb_len = 4, 1024, 256

        def build(mesh_sp):
            kw = dict(
                reverb_num_samples=reverb_len,
                compressor_smoother="parallel",
                reverb_noise_mode="time",
            )
            if mesh_sp is not None:
                kw["eq_filter_method"] = partial(sharded_sosfilt_coupled, mesh=mesh_sp)
                kw["reverb_ir_conv_fn"] = partial(
                    sharded_fft_conv_causal, mesh=mesh_sp, method="direct")
            else:
                kw["eq_filter_method"] = "coupled"
                kw["reverb_ir_conv_fn"] = _direct_conv
            return make_style_processors(SR, **kw)

        def _direct_conv(x, h):
            from dasp_tpu.parallel.sharded import _direct_causal_conv

            return _direct_causal_conv(x, h)

        net = StyleTransferNet(embed_dim=8, ch_dim=4, encoder_dilations=(1, 2))
        x = jnp.asarray(RNG.standard_normal((bs, 1, half)).astype(np.float32) * 0.25)
        ref = jnp.asarray(RNG.standard_normal((bs, 1, half)).astype(np.float32) * 0.25)
        variables = net.init(jax.random.PRNGKey(0), x, x, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        key = jax.random.PRNGKey(5)

        def make_grads_fn(processors):
            def loss_fn(params, x, ref):
                p, _ = net.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, jnp.mean(ref, axis=1, keepdims=True),
                    train=True, mutable=["batch_stats"],
                )
                y = processors["equalizer"].process_normalized(x, p["equalizer"], clip_params=True)
                y = processors["compressor"].process_normalized(y, p["compressor"], clip_params=True)
                y = processors["reverb"].process_normalized(y, p["reverb"], clip_params=True, key=key)
                y = processors["gain"].process_normalized(y, p["gain"], clip_params=True)
                return multi_resolution_stft_loss(
                    y, jnp.tile(ref, (1, y.shape[1], 1)), cpu_fft_workaround=True)

            return jax.jit(jax.value_and_grad(loss_fn))

        # dp-only reference (replicated data, no mesh)
        loss_ref, grads_ref = make_grads_fn(build(None))(params, x, ref)

        # dp=4 x sp=2, batch sharded over dp
        mesh = make_mesh((4, 2))
        xs, refs = shard_batch(x, mesh), shard_batch(ref, mesh)
        params_r = replicate(params, mesh)
        loss_sp, grads_sp = make_grads_fn(build(mesh))(params_r, xs, refs)

        np.testing.assert_allclose(float(loss_sp), float(loss_ref), atol=2e-5, rtol=2e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
        flat_sp = jax.tree.leaves(grads_sp)
        assert len(flat_ref) == len(flat_sp)
        for (path, g_ref), g_sp in zip(flat_ref, flat_sp):
            scale = max(np.abs(np.asarray(g_ref)).max(), 1e-6)
            # 3e-3: fp32 reassociation (psum order, sharded partial sums)
            # amplified through the log-magnitude loss terms
            np.testing.assert_allclose(
                np.asarray(g_sp) / scale, np.asarray(g_ref) / scale,
                atol=3e-3, err_msg=str(path))

    def test_batch_sharding_layout(self, devices_ok):
        mesh = make_mesh((8, 1))
        x = jnp.zeros((16, 2, 128))
        xs = shard_batch(x, mesh)
        assert xs.sharding == batch_sharding(mesh)
        # each device holds 2 batch items
        assert xs.addressable_shards[0].data.shape == (2, 2, 128)


class TestShardedWOLA:
    """Sequence-sharded WOLA machinery (VERDICT r2 #3): tv filtering,
    detector power, the MR-STFT loss, and the four WOLA effects must
    match their unsharded versions forward AND backward."""

    FS, HOP, T = 512, 128, 8192

    def _xh(self, bs=2, chs=2, cplx=True):
        from dasp_tpu.ops.tv_filter import tv_frame_count

        # fresh generator: the draws must not depend on which tests ran
        # before (a shared module RNG made one knife-edge grad comparison
        # pass standalone and fail in the full suite)
        rng = np.random.default_rng(911)
        n_fft = 4 * self.FS
        n_frames = tv_frame_count(self.T, self.FS, self.HOP)
        x = jnp.asarray(rng.standard_normal((bs, chs, self.T)).astype(np.float32))
        Hr = rng.standard_normal((bs, n_frames, n_fft // 2 + 1)).astype(np.float32) * 0.3
        if cplx:
            Hi = rng.standard_normal((bs, n_frames, n_fft // 2 + 1)).astype(np.float32) * 0.3
            return x, jnp.asarray(Hr + 1j * Hi)
        return x, jnp.asarray(Hr)

    @pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
    def test_tv_freq_filter_matches(self, devices_ok, shape):
        from dasp_tpu.ops.tv_filter import tv_freq_filter
        from dasp_tpu.parallel import sharded_tv_freq_filter

        mesh = make_mesh(shape)
        x, H = self._xh()
        ref = jax.jit(lambda x, H: tv_freq_filter(x, H, self.FS, self.HOP))(x, H)
        out = jax.jit(
            lambda x, H: sharded_tv_freq_filter(x, H, self.FS, self.HOP, mesh)
        )(x, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_tv_freq_filter_grads_match(self, devices_ok):
        from dasp_tpu.ops.tv_filter import tv_freq_filter
        from dasp_tpu.parallel import sharded_tv_freq_filter

        mesh = make_mesh((2, 4))
        x, H = self._xh()

        def loss(fn, x, H):
            return jnp.sum(fn(x, H, self.FS, self.HOP) ** 2)

        gx_r, gH_r = jax.jit(jax.grad(
            lambda x, H: loss(tv_freq_filter, x, H), argnums=(0, 1)))(x, H)
        gx_s, gH_s = jax.jit(jax.grad(
            lambda x, H: loss(
                lambda *a: sharded_tv_freq_filter(*a, mesh), x, H),
            argnums=(0, 1)))(x, H)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gH_s), np.asarray(gH_r), atol=1e-3)

    def test_tv_freq_filter_batch_split_dp(self, devices_ok):
        """batch_axis_name='dp' splits items over dp instead of
        replicating the frame work on every dp row."""
        from dasp_tpu.ops.tv_filter import tv_freq_filter
        from dasp_tpu.parallel import sharded_tv_freq_filter

        mesh = make_mesh((4, 2))
        x, H = self._xh(bs=4)
        ref = jax.jit(lambda x, H: tv_freq_filter(x, H, self.FS, self.HOP))(x, H)
        out = jax.jit(lambda x, H: sharded_tv_freq_filter(
            x, H, self.FS, self.HOP, mesh, batch_axis_name="dp"))(x, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_tv_power_matches(self, devices_ok):
        from dasp_tpu.ops.tv_filter import tv_stft
        from dasp_tpu.parallel import sharded_tv_power

        mesh = make_mesh((2, 4))
        x, _ = self._xh()
        n_fft = 4 * self.FS
        ref = jax.jit(lambda x: jnp.mean(
            jnp.abs(tv_stft(x, self.FS, self.HOP, n_fft)) ** 2, axis=1))(x)
        out = jax.jit(lambda x: sharded_tv_power(
            x, self.FS, self.HOP, n_fft, mesh))(x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4 * float(jnp.max(ref)))

    def test_mrstft_loss_matches(self, devices_ok):
        from dasp_tpu.parallel import sharded_multi_resolution_stft_loss
        from dasp_tpu.utils import multi_resolution_stft_loss

        mesh = make_mesh((2, 4))
        x, _ = self._xh()
        y = jnp.asarray(RNG.standard_normal(x.shape).astype(np.float32))
        ref = jax.jit(lambda a, b: multi_resolution_stft_loss(
            a, b, cpu_fft_workaround=True))(x, y)
        out = jax.jit(lambda a, b: sharded_multi_resolution_stft_loss(
            a, b, mesh))(x, y)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)

        # grads: equal up to the fp knife-edge at the eps magnitude clip
        # (an fp-level forward difference flips clip's 0-gradient against
        # a 1/mag-amplified one at isolated entries) — compare in l2
        gr = jax.jit(jax.grad(lambda a: multi_resolution_stft_loss(
            a, y, cpu_fft_workaround=True)))(x)
        gs = jax.jit(jax.grad(lambda a: sharded_multi_resolution_stft_loss(
            a, y, mesh)))(x)
        rel = float(jnp.linalg.norm(gr - gs) / jnp.linalg.norm(gr))
        assert rel < 1e-3, rel

    def test_mrstft_loss_dp_split_matches(self, devices_ok):
        from dasp_tpu.parallel import sharded_multi_resolution_stft_loss
        from dasp_tpu.utils import multi_resolution_stft_loss

        mesh = make_mesh((4, 2))
        x, _ = self._xh(bs=4)
        y = jnp.asarray(RNG.standard_normal(x.shape).astype(np.float32))
        ref = jax.jit(lambda a, b: multi_resolution_stft_loss(
            a, b, cpu_fft_workaround=True))(x, y)
        out = jax.jit(lambda a, b: sharded_multi_resolution_stft_loss(
            a, b, mesh, batch_axis_name="dp"))(x, y)
        np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)

    @pytest.mark.parametrize("effect", ["phaser", "auto_wah", "spectral_gate", "dynamic_eq"])
    def test_wola_effects_sharded_match(self, devices_ok, effect):
        """Every WOLA-family effect must produce the same audio and
        input-gradients under its sequence-parallel plug points."""
        from functools import partial

        import dasp_tpu.functional as F
        from dasp_tpu.parallel import sharded_tv_freq_filter, sharded_tv_power

        mesh = make_mesh((4, 2))
        filt = partial(sharded_tv_freq_filter, mesh=mesh)
        powf = partial(sharded_tv_power, mesh=mesh)
        x = jnp.asarray(RNG.standard_normal((2, 2, self.T)).astype(np.float32) * 0.3)
        half = jnp.array([0.5, 0.5])

        if effect == "phaser":
            fu = lambda x, **kw: F.phaser(
                x, SR, jnp.array([1.0, 2.0]), half, jnp.array([800.0, 1200.0]),
                jnp.array([0.4, 0.2]), half, **kw)
            kw = {"tv_filter_fn": filt}
        elif effect == "auto_wah":
            fu = lambda x, **kw: F.auto_wah(
                x, SR, jnp.array([5.0, 8.0]), jnp.array([10.0, 20.0]),
                jnp.array([80.0, 120.0]), jnp.array([300.0, 400.0]),
                jnp.array([2000.0, 3000.0]), jnp.array([2.0, 4.0]), half, **kw)
            kw = {"tv_filter_fn": filt}
        elif effect == "spectral_gate":
            fu = lambda x, **kw: F.spectral_gate(
                x, SR, jnp.array([6.0, 8.0]), jnp.array([24.0, 18.0]),
                jnp.array([5.0, 10.0]), jnp.array([80.0, 120.0]),
                frame_size=1024, hop=256, **kw)
            kw = {"tv_power_fn": powf, "tv_filter_fn": filt}
        else:
            fu = lambda x, **kw: F.dynamic_eq(
                x, SR, jnp.array([[300.0, 2000.0], [500.0, 4000.0]]),
                2.0, -30.0, 4.0, 5.0, 80.0, frame_size=512, hop=128, **kw)
            kw = {"tv_power_fn": powf, "tv_filter_fn": filt}

        ref = jax.jit(lambda x: fu(x))(x)
        out = jax.jit(lambda x: fu(x, **kw))(x)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5 * max(scale, 1.0))

        gr = jax.jit(jax.grad(lambda x: jnp.sum(fu(x) ** 2)))(x)
        gs = jax.jit(jax.grad(lambda x: jnp.sum(fu(x, **kw) ** 2)))(x)
        rel = float(jnp.linalg.norm(gr - gs) / (jnp.linalg.norm(gr) + 1e-12))
        assert rel < 1e-4, rel

    def test_tv_shard_errors(self, devices_ok):
        from dasp_tpu.parallel import sharded_tv_freq_filter

        mesh = make_mesh((1, 8))
        x, H = self._xh()
        with pytest.raises(ValueError, match="halo"):
            # T/8 = 1024 < n_fft - hop = 1920
            jax.eval_shape(
                lambda x, H: sharded_tv_freq_filter(x, H, self.FS, self.HOP, mesh),
                x, H)


class TestCollectiveBudget:
    def test_dpsp_step_collective_count(self, devices_ok):
        """Regression guard on the compiled dp=4 x sp=2 train step's
        collective count (benchmarks/collectives_audit.py found 44, all
        by design, after making the loss re-materialization explicit;
        the implicit-GSPMD version had 140). A jump past the budget
        means a code change reintroduced auto-partitioned reshards
        between chain stages — invisible in wall-clock on the virtual
        mesh, expensive on a real pod."""
        import re

        from __graft_entry__ import build_dpsp_step

        w = build_dpsp_step(8, (4, 2))
        txt = jax.jit(w["train_step"]).lower(*w["args"]).compile().as_text()
        ops = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")
        total = 0
        for line in txt.splitlines():
            for op in ops:
                if re.search(r"\b" + op + r"(-start)?\(", line) and \
                        not re.search(r"\b" + op + r"-done\(", line):
                    total += 1
                    break
        # 44 measured + headroom for benign XLA-version drift
        assert total <= 60, (
            f"compiled dpsp step has {total} collectives (budget 60); run "
            f"benchmarks/collectives_audit.py to attribute the new ones")


class TestMasteringDryrun:
    """The mastering chain trains dp x sp on the virtual mesh
    (VERDICT r2 #3 'Done' criterion), and the sp-sharded chain output
    matches the unsharded chain."""

    def test_dryrun_mastering(self, devices_ok):
        import importlib.util
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__graft_entry__.py")
        spec = importlib.util.spec_from_file_location("graft_entry_m", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip_mastering(8)

    def test_mastering_chain_sp_equivalence(self, devices_ok):
        """Full mastering chain: sp-sharded DynamicEQ == unsharded,
        forward and parameter gradients."""
        from functools import partial

        from dasp_tpu.parallel import sharded_tv_freq_filter, sharded_tv_power

        mesh = make_mesh((1, 8))
        sr = SR
        x = jnp.asarray(RNG.standard_normal((2, 2, 8192)).astype(np.float32) * 0.25)

        def build(shard):
            kw = {}
            if shard:
                kw = {
                    "tv_power_fn": partial(sharded_tv_power, mesh=mesh),
                    "tv_filter_fn": partial(sharded_tv_freq_filter, mesh=mesh),
                }
            return D.Chain([
                D.TransientShaper(sr),
                D.DynamicEQ(sr, num_bands=3, frame_size=256, hop=64, **kw),
                D.MultibandCompressor(sr),
                D.Exciter(sr),
                D.Limiter(sr),
            ])

        c_ref, c_sp = build(False), build(True)
        p = jnp.full((2, c_ref.num_params), 0.55, jnp.float32)

        def run(chain, x, p):
            return chain.process_normalized(x, p, clip_params=True)

        y_ref = jax.jit(partial(run, c_ref))(x, p)
        y_sp = jax.jit(partial(run, c_sp))(x, p)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=5e-5)

        g_ref = jax.jit(jax.grad(lambda p: jnp.sum(run(c_ref, x, p) ** 2)))(p)
        g_sp = jax.jit(jax.grad(lambda p: jnp.sum(run(c_sp, x, p) ** 2)))(p)
        rel = float(jnp.linalg.norm(g_ref - g_sp) / (jnp.linalg.norm(g_ref) + 1e-12))
        assert rel < 1e-4, rel

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

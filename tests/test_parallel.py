"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import dasp_tpu as D
from dasp_tpu.ops import fft_conv_causal
from dasp_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    sharded_fft_conv_causal,
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

    def test_rejects_too_long_ir(self, devices_ok):
        mesh = make_mesh((1, 8))
        x = jnp.zeros((1, 1, 1024))
        h = jnp.zeros((1, 1, 512))  # halo 511 > block 128
        with pytest.raises(AssertionError, match="halo"):
            sharded_fft_conv_causal(x, h, mesh)


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

    def test_batch_sharding_layout(self, devices_ok):
        mesh = make_mesh((8, 1))
        x = jnp.zeros((16, 2, 128))
        xs = shard_batch(x, mesh)
        assert xs.sharding == batch_sharding(mesh)
        # each device holds 2 batch items
        assert xs.addressable_shards[0].data.shape == (2, 2, 128)

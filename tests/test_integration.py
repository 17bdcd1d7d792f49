"""Example-level integration tests (SURVEY.md §4 item 4): tiny-scale
versions of the training recipes asserting the loss actually decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import dasp_tpu as D
from dasp_tpu.models import ParameterNetwork, StyleTransferNet, apply_style_chain, make_style_processors
from dasp_tpu.utils import multi_resolution_stft_loss, stft_loss, synthetic_batch

SR = 44100


def test_quickstart_recovers_drive():
    """E1: gradient descent through the effect recovers the parameter."""
    x = jnp.asarray(synthetic_batch(np.random.default_rng(0), 1, 8192, SR))
    target = D.distortion(x, SR, jnp.array([16.0]))

    @jax.jit
    def loss_fn(drive):
        return jnp.mean((D.distortion(x, SR, drive) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn))
    opt = optax.adam(0.05)
    drive = jnp.array([0.0])
    state = opt.init(drive)
    l0 = float(loss_fn(drive))
    for _ in range(300):
        g = grad_fn(drive)
        upd, state = opt.update(g, state)
        drive = optax.apply_updates(drive, upd)
    l1 = float(loss_fn(drive))
    assert l1 < l0 / 20, f"loss {l0} -> {l1}"
    assert abs(float(drive[0]) - 16.0) < 4.0


def test_blind_estimation_loss_decreases():
    """E4 at tiny scale: param net + compressor re-render, STFT loss."""
    proc = D.Compressor(SR)
    net = ParameterNetwork(proc.num_params, channels=(8, 8), dilations=(1, 2))
    bs, T = 2, 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(synthetic_batch(rng, bs, T, SR))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rand_params = jnp.asarray(rng.uniform(0.2, 0.8, (bs, proc.num_params)).astype(np.float32))

    @jax.jit
    def step(params, batch_stats, opt_state):
        y = proc.process_normalized(x, rand_params, clip_params=True)

        def loss_fn(params):
            p_hat, upd = net.apply({"params": params, "batch_stats": batch_stats},
                                   y, train=True, mutable=["batch_stats"])
            y_hat = proc.process_normalized(x, p_hat, clip_params=True)
            return stft_loss(y_hat, y, fft_size=512, hop_size=128, win_length=512), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, u), new_stats, opt_state, loss

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert min(losses[-5:]) < losses[0], f"no improvement: {losses[0]} -> {losses[-5:]}"


def test_style_transfer_step_runs_and_improves():
    """E7 at tiny scale: full chain + encoder; loss finite and decreasing."""
    processors = make_style_processors(SR, reverb_num_samples=1024)
    net = StyleTransferNet(embed_dim=16, ch_dim=4, encoder_dilations=(1, 2))
    bs, half = 2, 4096
    rng = np.random.default_rng(1)
    x_full = jnp.asarray(synthetic_batch(rng, bs, 2 * half, SR))
    variables = net.init(jax.random.PRNGKey(0), x_full[..., :half], x_full[..., :half], train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rand = {
        "eq": jnp.asarray(rng.uniform(0.3, 0.7, (bs, 18)).astype(np.float32)),
        "comp": jnp.asarray(rng.uniform(0.3, 0.7, (bs, 6)).astype(np.float32)),
        "reverb": jnp.asarray(rng.uniform(0.3, 0.7, (bs, 25)).astype(np.float32)),
    }

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        k_ref, k_out = jax.random.split(key)
        ref = processors["equalizer"].process_normalized(x_full, rand["eq"], clip_params=True)
        ref = processors["compressor"].process_normalized(ref, rand["comp"], clip_params=True)
        ref = processors["reverb"].process_normalized(ref, rand["reverb"], clip_params=True, key=k_ref)
        input_a, _ = jnp.split(x_full, 2, axis=-1)
        ref_a, ref_b = jnp.split(ref, 2, axis=-1)

        def loss_fn(params):
            p, upd = net.apply({"params": params, "batch_stats": batch_stats},
                               input_a, jnp.mean(ref_b, axis=1, keepdims=True),
                               train=True, mutable=["batch_stats"])
            out_a = apply_style_chain(processors, input_a, p, k_out)
            return multi_resolution_stft_loss(out_a, ref_a), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, u), new_stats, opt_state, loss

    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(15):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0], f"no improvement: {losses}"


def test_virtual_analog_pretrain_mlp():
    """E6's nonlinearity pretraining converges to tanh."""
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x[..., None]
            for _ in range(2):
                h = nn.relu(nn.Dense(32)(h))
            return nn.Dense(1)(h)[..., 0]

    mlp = MLP()
    rng = np.random.default_rng(0)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((4, 1, 16)))["params"]
    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, x):
        def loss_fn(params):
            return jnp.mean((mlp.apply({"params": params}, x) - jnp.tanh(x)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, state = opt.update(g, state)
        return optax.apply_updates(params, u), state, loss

    for i in range(300):
        x = jnp.asarray(rng.uniform(-3, 3, (32, 1, 64)).astype(np.float32))
        params, state, loss = step(params, state, x)
    assert float(loss) < 1e-2


def test_virtual_analog_amps_recipe(tmp_path):
    """E6's real-data path: --amps trains one model per (input, amp-output)
    wav pair and writes prediction/input/target wavs (reference
    virtual_analog.py:388-448). Download is skipped by pre-placing a
    stand-in pair, which is exactly the documented offline fallback."""
    import os
    import subprocess
    import sys

    from dasp_tpu.utils.audio import save_wav

    amp_dir = tmp_path / "amps"
    amp_dir.mkdir()
    rng = np.random.default_rng(0)
    src = (rng.standard_normal((1, 8192 * 4)) * 0.2).astype(np.float32)
    save_wav(str(amp_dir / "idmt-rock-input-varying-gain.wav"), src, 44100)
    save_wav(str(amp_dir / "idmt-rock-clean2-jazz-amp-120.wav"),
             np.tanh(3.0 * src).astype(np.float32), 44100)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, "examples/virtual_analog.py", "--amps", "jazz-amp",
         "--smoke", "--steps", "2", "--amp-audio-dir", str(amp_dir),
         "--log-dir", str(tmp_path / "out")],
        cwd=root, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    out_audio = tmp_path / "out" / "jazz-amp" / "audio"
    names = sorted(p.name for p in out_audio.iterdir())
    assert any(n.endswith("-pred.wav") for n in names), names
    assert any(n.endswith("-target.wav") for n in names), names


def test_resume_after_kill(tmp_path):
    """Failure recovery (SURVEY §5): SIGKILL a trainer mid-run, resume
    from its checkpoint, and assert the run CONTINUES the trajectory
    (starts at the checkpointed step, never back at 0) and completes."""
    import json
    import os
    import subprocess
    import sys
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    log_dir = tmp_path / "run"
    argv = [sys.executable, "examples/blind_estimation.py", "--smoke",
            "--steps", "40", "--checkpoint-every", "2",
            "--log-dir", str(log_dir)]

    proc = subprocess.Popen(argv, cwd=root, env=env,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    ckpt = log_dir / "ckpt.pkl"
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if ckpt.exists():
                break
            if proc.poll() is not None:
                pytest.fail(f"trainer exited early rc={proc.returncode}")
            time.sleep(0.5)
        assert ckpt.exists(), "no checkpoint appeared within the deadline"
    finally:
        proc.kill()  # hard kill, by pid — simulates host failure
        proc.wait()

    # resume: must start at the checkpointed step, finish the short run
    import pickle
    with open(ckpt, "rb") as f:
        ckpt_step = int(pickle.load(f)["step"])
    out = subprocess.run(
        argv[:4] + [str(ckpt_step + 4)] + argv[5:] + ["--resume"],
        cwd=root, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "resumed from step" in out.stdout
    resumed_at = int(out.stdout.split("resumed from step")[1].split()[0])
    assert resumed_at >= 2, out.stdout
    # the trajectory continues: every step logged after resume is >= the
    # resume step (never restarts at 0), and the final loss is finite
    metrics = [json.loads(l) for l in open(log_dir / "metrics.jsonl")]
    post = [m for m in metrics if m["step"] >= resumed_at]
    assert post and all(np.isfinite(m["loss"]) for m in post), metrics
    steps_printed = [int(s.split()[1]) for s in out.stdout.splitlines()
                     if s.strip().startswith("step")]
    assert steps_printed and min(steps_printed) >= resumed_at, out.stdout


def test_checked_wrapper_catches_nan():
    from functools import partial

    from dasp_tpu.utils.debug import checked

    safe_gain = checked(partial(D.gain))
    x = jnp.ones((1, 1, 256))
    y = safe_gain(x, SR, jnp.array([3.0]))  # clean pass
    assert y.shape == x.shape

    x_bad = x.at[0, 0, 5].set(jnp.nan)
    with pytest.raises(Exception, match="NaN|Inf|nan"):
        safe_gain(x_bad, SR, jnp.array([3.0]))


def test_mastering_chain_loss_decreases():
    """examples/mastering.py at tiny scale: the 5-processor mastering
    chain (transient shaper -> dynamic EQ -> multiband compressor ->
    exciter -> limiter) renders, differentiates and improves under one
    jit."""
    chain = D.Chain([
        D.TransientShaper(SR),
        D.DynamicEQ(SR, num_bands=3),
        D.MultibandCompressor(SR),
        D.Exciter(SR),
        D.Limiter(SR),
    ])
    bs, T = 1, 8192
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.repeat(synthetic_batch(rng, bs, T, SR), 2, axis=1))
    p_true = jnp.asarray(
        np.clip(0.5 + 0.25 * rng.standard_normal((bs, chain.num_params)), 0.05, 0.95),
        jnp.float32,
    )
    target = jax.jit(
        lambda x, p: chain.process_normalized(x, p, clip_params=True)
    )(x, p_true)

    z = jnp.zeros((bs, chain.num_params), jnp.float32)
    opt = optax.adam(3e-2)
    opt_state = opt.init(z)

    @jax.jit
    def step(z, opt_state):
        def loss_fn(z):
            y = chain.process_normalized(x, jax.nn.sigmoid(z), clip_params=True)
            return jnp.mean((y - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(z)
        u, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(z, u), opt_state, loss

    losses = []
    for _ in range(25):
        z, opt_state, loss = step(z, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < 0.5 * losses[0], f"{losses[0]} -> {losses[-5:]}"


def test_denoise_gate_improves_snr():
    """examples/denoise.py at tiny scale: measured-profile spectral gate
    lifts SNR by > 5 dB on broadband noise."""
    rng = np.random.default_rng(4)
    clean = synthetic_batch(rng, 1, 32768, SR)
    amp = 10.0 ** (-30.0 / 20.0)
    noisy = clean + (amp * rng.standard_normal(clean.shape)).astype(np.float32)
    noise_only = (amp * rng.standard_normal(clean.shape)).astype(np.float32)
    prof = jax.jit(D.spectral_noise_profile)(noise_only)

    gate = D.SpectralGate(SR)
    p = jnp.asarray([[0.25, 0.66, 0.08, 0.14]], jnp.float32)
    y = jax.jit(
        lambda x, p: gate.process_normalized(x, p, clip_params=True, noise_profile_db=prof)
    )(jnp.asarray(noisy), p)

    def snr(s):
        n = np.asarray(s) - clean
        return 10 * np.log10(np.mean(clean**2) / np.mean(n**2))

    assert snr(y) > snr(noisy) + 5.0, (snr(noisy), snr(y))

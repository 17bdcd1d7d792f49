"""Virtual analog: grey-box distortion model (EQ -> MLP -> EQ).

Mirrors the reference examples/virtual_analog.py:185-448: a
DistortionModel holds two learnable normalized EQ parameter vectors
(sigmoid-squashed) around a small MLP nonlinearity; the MLP is pretrained
to fit tanh; the whole model is fit to (clean, amp-processed) pairs with
MR-STFT + 100*MSE. Without the IDMT dataset, targets are synthesized by a
hidden reference "amp" (EQ -> distortion -> EQ with fixed params).

The real-data reproduction (reference virtual_analog.py:349-448) trains
one model per IDMT amp recording: ``--amps`` downloads the six
(input, amp-output) pairs from csteinmetz1.github.io and loops over
them, saving a checkpoint + prediction/input/target wavs per amp.

    python examples/virtual_analog.py [--data-dir wavs/] [--steps N] [--smoke]
    python examples/virtual_analog.py --amps                       # all six
    python examples/virtual_analog.py --amps jazz-amp --smoke --steps 3
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.utils import MetricsLogger, multi_resolution_stft_loss, save_checkpoint

from common import base_parser, device_batches

MRSTFT_KW = dict(  # virtual_analog.py:288-300 configuration
    fft_sizes=(128, 256, 512, 1024, 2048, 4096, 8192),
    hop_sizes=(64, 128, 256, 512, 1024, 2048, 4096),
    win_lengths=(128, 256, 512, 1024, 2048, 4096, 8192),
    w_sc=0.0, w_log_mag=1.0, w_lin_mag=1.0,
    perceptual_weighting=True,
)


class MLPNonlinearity(nn.Module):
    """Pointwise 1->128x4->1 MLP waveshaper (virtual_analog.py:207-217)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x):
        # x: (bs, chs, T) -> treat each sample as a 1-feature token
        h = x[..., None]
        for _ in range(4):
            h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(1)(h)[..., 0]


# the six IDMT-SMT-Audio-Effects amp recordings the reference trains on
# (virtual_analog.py:349-375), all responses to the same varying-gain input
IDMT_SRC = "idmt-rock-input-varying-gain.wav"
IDMT_AMPS = {
    "65twin-reverb": "idmt-rock-clean1-65twin-reverb.wav",
    "jazz-amp": "idmt-rock-clean2-jazz-amp-120.wav",
    "orange-dual-terror": "idmt-rock-crunch1-orange-dual-terror.wav",
    "british-blue-tube-30": "idmt-rock-crunch2-british-blue-tube-30tb.wav",
    "brit-8000": "idmt-rock-high-gain1-brit-8000.wav",
    "mesa-triple-rectifier": "idmt-rock-high-gain2-mesa-triple-rectifier.wav",
}
IDMT_URL = "https://csteinmetz1.github.io/sounds/assets/amps/"


def fetch_idmt_amps(audio_dir: str, names) -> None:
    """Acquire the IDMT amp pairs via the dataset registry
    (reference virtual_analog.py:377-385's wget loop, upgraded to
    resumable verified fetch — dasp_tpu.utils.datasets)."""
    from dasp_tpu.utils import datasets

    files = [IDMT_SRC] + [IDMT_AMPS[n] for n in names]
    try:
        datasets.acquire("idmt-amps", audio_dir, files=files)
    except datasets.DownloadError as e:
        raise SystemExit(
            f"{e}\nOr run without --amps for synthetic targets."
        )


def paired_chunk_iterator(src, target, length, batch_size, nprng):
    """Random batches of aligned (src, target) chunks — the reference's
    FileDataset (sequential length-32768 segments, shuffled; :159-184)."""
    n_segments = src.shape[-1] // length
    assert n_segments > 0, f"file shorter than one {length}-sample segment"
    while True:
        idx = nprng.integers(0, n_segments, size=batch_size)
        starts = idx * length
        sb = np.stack([src[:, s : s + length] for s in starts])
        tb = np.stack([target[:, s : s + length] for s in starts])
        yield sb, tb


def hidden_amp(x, sr):
    """The 'real amp' used to synthesize targets when no dataset is given."""
    bs = x.shape[0]
    f = lambda v: jnp.full((bs,), v)  # noqa: E731
    y = D.parametric_eq(x, sr, f(6.0), f(120.0), f(0.7), f(8.0), f(700.0), f(1.2),
                        f(-4.0), f(3000.0), f(2.0), f(2.0), f(9000.0), f(1.0),
                        f(0.0), f(13000.0), f(1.0), f(-6.0), f(7000.0), f(0.7))
    y = D.distortion(y, sr, f(18.0))
    y = D.parametric_eq(y, sr, f(-3.0), f(150.0), f(0.7), f(3.0), f(900.0), f(1.0),
                        f(2.0), f(4000.0), f(1.5), f(0.0), f(9000.0), f(1.0),
                        f(0.0), f(13000.0), f(1.0), f(-8.0), f(8000.0), f(0.7))
    return y


def fit_distortion_model(args, sr, data_iter, log_dir, synth_amp=None):
    """Pretrain the MLP nonlinearity, then fit the grey-box model to
    (src, target) batches from ``data_iter`` (target None => rendered by
    ``synth_amp``). Returns (params, jitted forward)."""
    os.makedirs(log_dir, exist_ok=True)

    equalizer = D.ParametricEQ(sr, min_gain_db=-48.0, max_gain_db=48.0,  # :198
                               filter_method=args.filter_method)
    mlp = MLPNonlinearity()

    rng = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(rng, 3)
    model_params = {
        "pre": jax.random.uniform(k1, (1, equalizer.num_params)) * 0.1,   # :203-205
        "post": jax.random.uniform(k2, (1, equalizer.num_params)) * 0.1,  # :218-220
        "mlp": mlp.init(k3, jnp.zeros((1, 1, 16)))["params"],
    }

    # ---- pretrain the MLP to fit tanh (virtual_analog.py:253-272) ----
    pre_opt = optax.adam(1e-3)
    pre_state = pre_opt.init(model_params["mlp"])

    @jax.jit
    def pretrain_step(mp, opt_state, x):
        def loss_fn(mp):
            y_hat = mlp.apply({"params": mp}, x)
            return jnp.mean((y_hat - jnp.tanh(x)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(mp)
        upd, opt_state = pre_opt.update(g, opt_state)
        return optax.apply_updates(mp, upd), opt_state, loss

    nprng = np.random.default_rng(args.seed + 2)
    pre_iters = 200 if args.smoke else 2000
    mp = model_params["mlp"]
    for i in range(pre_iters):
        xb = jnp.asarray(nprng.uniform(-3, 3, (32, 1, 64)).astype(np.float32))
        mp, pre_state, ploss = pretrain_step(mp, pre_state, xb)
    model_params["mlp"] = mp
    print(f"nonlinearity pretrained: tanh fit mse {float(ploss):.2e}")

    # ---- fit the full grey-box model ----
    def forward(params, x):
        bs = x.shape[0]
        pre = jnp.tile(jax.nn.sigmoid(params["pre"]), (bs, 1))
        post = jnp.tile(jax.nn.sigmoid(params["post"]), (bs, 1))
        y = equalizer.process_normalized(x, pre, clip_params=True)
        y = mlp.apply({"params": params["mlp"]}, y)
        y = equalizer.process_normalized(y, post, clip_params=True)
        return y

    opt = optax.adam(args.lr)
    opt_state = opt.init(model_params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, src, target):
        def loss_fn(params):
            y_hat = forward(params, src)
            freq = multi_resolution_stft_loss(
                y_hat, target, sample_rate=sr,
                auraloss_compat=args.auraloss_compat, **MRSTFT_KW)
            time_l = jnp.mean((y_hat - target) ** 2)
            return freq + 100.0 * time_l, (freq, time_l)

        (loss, (freq, time_l)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss, freq, time_l

    logger = MetricsLogger(log_dir)
    params = model_params
    for step in range(args.steps):
        src_np, target_np = next(data_iter)
        src = jnp.asarray(src_np)
        target = synth_amp(src) if target_np is None else jnp.asarray(target_np)
        params, opt_state, loss, freq, time_l = train_step(params, opt_state, src, target)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  loss {float(loss):.4f}  (freq {float(freq):.4f}, "
                  f"mse {float(time_l):.2e})")
            logger.log(step, loss=loss, freq=freq, mse=time_l)

    save_checkpoint(os.path.join(log_dir, "ckpt.pkl"), {"params": params, "step": args.steps})
    print(f"done; metrics at {logger.path}")
    return params, jax.jit(forward)


def run_amps(args):
    """Per-amp reproduction loop (reference virtual_analog.py:388-448):
    one grey-box model per IDMT amp, prediction wavs saved per amp."""
    from dasp_tpu.utils.audio import load_wav, save_wav

    sr = args.sample_rate
    names = args.amps if args.amps else list(IDMT_AMPS)
    bad = [n for n in names if n not in IDMT_AMPS]
    if bad:
        raise SystemExit(f"unknown amp(s) {bad}; choose from {list(IDMT_AMPS)}")
    fetch_idmt_amps(args.amp_audio_dir, names)

    src, file_sr = load_wav(os.path.join(args.amp_audio_dir, IDMT_SRC))
    if file_sr != sr:
        print(f"warning: file rate {file_sr} != --sample-rate {sr}; using {file_sr}")
        sr = file_sr
    src = src[0:1]  # mono, like the reference (:425-428)

    base_log = args.log_dir or "outputs/virtual_analog"
    for name in names:
        print(f"=== amp: {name} ===")
        target, _ = load_wav(os.path.join(args.amp_audio_dir, IDMT_AMPS[name]))
        target = target[0:1]
        t = min(src.shape[-1], target.shape[-1])
        nprng = np.random.default_rng(args.seed)
        data_iter = paired_chunk_iterator(
            src[:, :t], target[:, :t], args.length, args.batch_size, nprng)

        log_dir = os.path.join(base_log, name)
        params, forward = fit_distortion_model(args, sr, data_iter, log_dir)

        # render a bounded-length prediction (chunks of args.length so the
        # FSM FFT stays at training size) and save the wav triple (:430-448)
        n_render = min(t // args.length, 8) * args.length
        chunks = [
            np.asarray(forward(params, jnp.asarray(src[None, :, s : s + args.length])))[0]
            for s in range(0, n_render, args.length)
        ]
        y_hat = np.concatenate(chunks, axis=-1)
        os.makedirs(os.path.join(log_dir, "audio"), exist_ok=True)
        stem = IDMT_AMPS[name].replace(".wav", "")
        save_wav(os.path.join(log_dir, "audio", f"{stem}-pred.wav"), y_hat, sr)
        save_wav(os.path.join(log_dir, "audio", f"{stem}-input.wav"),
                 np.asarray(src[:, :n_render]), sr)
        save_wav(os.path.join(log_dir, "audio", f"{stem}-target.wav"),
                 np.asarray(target[:, :n_render]), sr)
        print(f"saved prediction wavs under {log_dir}/audio")


def main():
    parser = base_parser(__doc__)
    parser.add_argument("--amps", nargs="*", default=None,
                        help="train one model per IDMT amp recording "
                             "(downloads the pairs on first use; no names = all six)")
    parser.add_argument("--amp-audio-dir", default="audio/amps",
                        help="where the IDMT wav pairs live / are downloaded to")
    args = parser.parse_args()
    args.lr = args.lr if args.lr != 1e-4 else 1e-2  # reference default (virtual_analog.py:281)
    if args.smoke:
        args.length, args.batch_size = 8192, 2
    elif args.length == 131072:
        args.length = 32768  # reference trains on 32768 (virtual_analog.py:392)
    sr = args.sample_rate

    if args.amps is not None:
        run_amps(args)
        return

    log_dir = args.log_dir or "outputs/virtual_analog"
    data = device_batches(args)  # async staged transfer, int16 wire
    data_iter = ((next(data), None) for _ in iter(int, 1))
    fit_distortion_model(args, sr, data_iter, log_dir,
                         synth_amp=jax.jit(lambda x: hidden_amp(x, sr)))


if __name__ == "__main__":
    main()

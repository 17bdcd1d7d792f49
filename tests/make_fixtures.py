"""Generate golden parity fixtures from the PyTorch reference.

Runs the reference implementation (read-only at /root/reference) on fixed
inputs/parameters and records outputs AND parameter gradients as .npz
files under tests/fixtures/. The JAX framework is then tested against
these to the BASELINE north-star tolerance of 1e-4 (output and gradient
parity) without needing torch at test time.

Usage:  python tests/make_fixtures.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")  # reference package, read-only
import dasp_pytorch  # noqa: E402
import dasp_pytorch.signal  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures")
os.makedirs(OUT, exist_ok=True)

SR = 44100
BS = 2
T = 16384  # long enough to exercise the FSM/FFT paths, short enough to be quick

torch.manual_seed(42)
rng = np.random.default_rng(42)


def audio(bs=BS, chs=1, t=T):
    x = rng.standard_normal((bs, chs, t)).astype(np.float32) * 0.25
    return x


def grads_and_output(fn, x_np, params: dict, loss="sum", extra=()):
    """Run fn(x, SR, **params); record output and d(loss)/d(param)."""
    x = torch.from_numpy(x_np)
    tparams = {k: torch.tensor(v, dtype=torch.float32, requires_grad=True) for k, v in params.items()}
    y = fn(x, SR, **tparams, **dict(extra))
    (y.square().mean() if loss == "mse" else y.sum()).backward()
    out = {"x": x_np, "y": y.detach().numpy()}
    for k, v in tparams.items():
        out[f"param_{k}"] = np.asarray(params[k], dtype=np.float32)
        # unused params (e.g. the reference ignores release_ms) have no grad
        g = v.grad.detach().numpy() if v.grad is not None else np.zeros_like(out[f"param_{k}"])
        out[f"grad_{k}"] = g
    return out


def save(name, d):
    np.savez(os.path.join(OUT, f"{name}.npz"), **d)
    print(f"wrote {name}.npz: " + ", ".join(f"{k}{np.shape(v)}" for k, v in d.items()))


# --- gain -------------------------------------------------------------
x = audio(chs=2)
save("gain", grads_and_output(dasp_pytorch.gain, x, {"gain_db": [4.5, -3.0]}, loss="mse"))

# --- distortion (mono: the reference breaks on stereo + (bs,) drive) ---
x = audio(chs=1)
save("distortion", grads_and_output(dasp_pytorch.distortion, x, {"drive_db": [16.0, 4.0]}, loss="mse"))

# --- parametric_eq ----------------------------------------------------
x = audio(chs=2)
eq_params = {
    "low_shelf_gain_db": [4.0, -4.0],
    "low_shelf_cutoff_freq": [100.0, 300.0],
    "low_shelf_q_factor": [0.7, 1.0],
    "band0_gain_db": [-6.0, 2.0],
    "band0_cutoff_freq": [400.0, 800.0],
    "band0_q_factor": [1.0, 2.0],
    "band1_gain_db": [3.0, -2.0],
    "band1_cutoff_freq": [3000.0, 2500.0],
    "band1_q_factor": [2.0, 0.5],
    "band2_gain_db": [-4.0, 5.0],
    "band2_cutoff_freq": [9000.0, 10000.0],
    "band2_q_factor": [1.5, 3.0],
    "band3_gain_db": [2.0, -1.0],
    "band3_cutoff_freq": [14000.0, 13000.0],
    "band3_q_factor": [1.0, 0.8],
    "high_shelf_gain_db": [-3.0, 6.0],
    "high_shelf_cutoff_freq": [8000.0, 6000.0],
    "high_shelf_q_factor": [0.7, 1.2],
}
save("parametric_eq", grads_and_output(dasp_pytorch.parametric_eq, x, eq_params, loss="mse"))

# --- compressor -------------------------------------------------------
x = audio(chs=2)
comp_params = {
    "threshold_db": [-24.0, -36.0],
    "ratio": [4.0, 8.0],
    "attack_ms": [10.0, 30.0],
    "release_ms": [60.0, 90.0],
    "knee_db": [6.0, 3.0],
    "makeup_gain_db": [3.0, 0.0],
}
save("compressor", grads_and_output(dasp_pytorch.compressor, x, comp_params, loss="mse"))

# compressor with lookahead
save(
    "compressor_lookahead",
    grads_and_output(
        dasp_pytorch.compressor, x, comp_params, loss="mse", extra=[("lookahead_samples", 32)]
    ),
)

# compressor in float64: verifies ALGORITHMIC parity to 1e-4 without the
# fp32 FFT-library rounding noise that dominates the fsm smoother in single
# precision (~2.5e-3 dB in both torch and jax, uncorrelated between FFT
# implementations).
xt64 = torch.from_numpy(x.astype(np.float64))
tp64 = {k: torch.tensor(v, dtype=torch.float64, requires_grad=True) for k, v in comp_params.items()}
y64 = dasp_pytorch.compressor(xt64, SR, **tp64)
y64.square().mean().backward()
c64 = {"x": x.astype(np.float64), "y": y64.detach().numpy()}
for k, v in tp64.items():
    c64[f"param_{k}"] = np.asarray(comp_params[k], dtype=np.float64)
    c64[f"grad_{k}"] = (
        v.grad.detach().numpy() if v.grad is not None else np.zeros_like(c64[f"param_{k}"])
    )
save("compressor_f64", c64)

# --- stereo_widener (bs=1: reference broadcasting quirk) ---------------
x1 = audio(bs=1, chs=2)
save("stereo_widener", grads_and_output(dasp_pytorch.stereo_widener, x1, {"width": [0.8]}, loss="mse"))

# widener bs=2 with (bs,1) width (the shape that works in the reference)
x = audio(chs=2)
save(
    "stereo_widener_bs2",
    grads_and_output(dasp_pytorch.stereo_widener, x, {"width": [[0.8], [0.3]]}, loss="mse"),
)

# --- stereo_panner ------------------------------------------------------
x = audio(chs=3)  # (bs, num_tracks, T) mono tracks
save(
    "stereo_panner",
    # pan strictly inside (0, 1): at the endpoints d(sqrt)/dx is infinite and
    # both frameworks produce NaN gradients (reference functional.py:623-624)
    grads_and_output(dasp_pytorch.stereo_panner, x, {"pan": [[0.2, 0.5, 0.9], [0.05, 0.95, 0.5]]}, loss="mse"),
)

# --- stereo_bus ---------------------------------------------------------
xb = rng.standard_normal((BS, 2, 3, T)).astype(np.float32) * 0.25
save(
    "stereo_bus",
    grads_and_output(
        dasp_pytorch.stereo_bus, xb, {"send_db": [[[-6.0], [0.0], [3.0]], [[-12.0], [6.0], [-3.0]]]},
        loss="mse",
    ),
)

# --- noise_shaped_reverberation (noise captured for parity) -------------
x = audio(chs=2, t=8192)
NUM_SAMPLES = 4096
NUM_TAPS = 1023
gains = {f"band{i}_gain": [[0.9 - 0.05 * i], [0.3 + 0.04 * i]] for i in range(12)}
decays = {f"band{i}_decay": [[0.2 + 0.05 * i], [0.8 - 0.03 * i]] for i in range(12)}
rev_params = {**gains, **decays, "mix": [[0.7], [0.4]]}

torch.manual_seed(1234)
noise = torch.randn(BS * 2, 12, NUM_SAMPLES + NUM_TAPS - 1)

_orig_randn = torch.randn
def _fixed_randn(*args, **kwargs):  # intercept the reference's hidden RNG draw
    return noise.clone()

xt = torch.from_numpy(x)
tparams = {k: torch.tensor(v, dtype=torch.float32, requires_grad=True) for k, v in rev_params.items()}
torch.randn = _fixed_randn
try:
    y = dasp_pytorch.noise_shaped_reverberation(
        xt, SR, **tparams, num_samples=NUM_SAMPLES, num_bandpass_taps=NUM_TAPS
    )
finally:
    torch.randn = _orig_randn
y.square().mean().backward()
rev_out = {"x": x, "y": y.detach().numpy(), "noise": noise.numpy(),
           "num_samples": np.int64(NUM_SAMPLES), "num_taps": np.int64(NUM_TAPS)}
for k, v in tparams.items():
    rev_out[f"param_{k}"] = np.asarray(rev_params[k], dtype=np.float32)
    rev_out[f"grad_{k}"] = v.grad.detach().numpy()
save("reverb", rev_out)

# --- full style chain: EQ -> compressor -> reverb -> gain ----------------
# The composition users actually train (reference
# examples/style_transfer.py:150-154): every stage through the
# Processor.process_normalized protocol (normalized (0,1) parameter
# tensors, module default ranges). The reverb stage runs the functional
# with explicit num_samples/num_bandpass_taps (the module hardcodes the
# functional's 65536-sample default, too large for a fixture) and a
# captured noise draw. Records the chain output and the gradient of
# mean(y^2) w.r.t. ALL FOUR normalized parameter tensors — gradient flow
# through the whole composition, not per-effect.
from dasp_pytorch.modules import (  # noqa: E402
    Compressor as RefComp,
    Gain as RefGain,
    NoiseShapedReverb as RefRev,
    ParametricEQ as RefEQ,
)

x = audio(chs=2, t=16384)
CH_SAMPLES, CH_TAPS = 4096, 1023
eq_m, comp_m, rev_m, gain_m = RefEQ(SR), RefComp(SR), RefRev(SR), RefGain(SR)
rng_p = np.random.default_rng(777)

def _norm_params(m):
    return torch.tensor(
        rng_p.uniform(0.15, 0.85, (BS, len(m.param_ranges))).astype(np.float32),
        requires_grad=True,
    )

t_eq, t_c, t_r, t_g = map(_norm_params, (eq_m, comp_m, rev_m, gain_m))

torch.manual_seed(4321)
chain_noise = torch.randn(BS * 2, 12, CH_SAMPLES + CH_TAPS - 1)

def _fixed_randn_chain(*args, **kwargs):
    return chain_noise.clone()

xt = torch.from_numpy(x)
y = eq_m.process_normalized(xt, t_eq)
y = comp_m.process_normalized(y, t_c)
pd = rev_m.denormalize_param_dict(rev_m.extract_param_dict(t_r))
torch.randn = _fixed_randn_chain
try:
    y = dasp_pytorch.noise_shaped_reverberation(
        y, SR, **pd, num_samples=CH_SAMPLES, num_bandpass_taps=CH_TAPS
    )
finally:
    torch.randn = _orig_randn
y = gain_m.process_normalized(y, t_g)
y.square().mean().backward()

chain_out = {"x": x, "y": y.detach().numpy(), "noise": chain_noise.numpy(),
             "num_samples": np.int64(CH_SAMPLES), "num_taps": np.int64(CH_TAPS)}
for nm, t in [("eq", t_eq), ("comp", t_c), ("reverb", t_r), ("gain", t_g)]:
    chain_out[f"param_{nm}"] = t.detach().numpy()
    chain_out[f"grad_{nm}"] = t.grad.detach().numpy()
save("style_chain", chain_out)

# --- signal-level fixtures ----------------------------------------------
# biquad coefficient design, all 5 types
for ftype in ["high_shelf", "low_shelf", "peaking", "low_pass", "high_pass"]:
    g = torch.tensor([6.0, -9.0])
    f = torch.tensor([1000.0, 6000.0])
    q = torch.tensor([0.707, 2.5])
    b, a = dasp_pytorch.signal.biquad(g, f, q, SR, ftype)
    save(f"biquad_{ftype}", {"gain_db": g.numpy(), "cutoff": f.numpy(), "q": q.numpy(),
                             "b": b.detach().numpy(), "a": a.detach().numpy()})

# octave_band_filterbank
fb = dasp_pytorch.signal.octave_band_filterbank(1023, SR)
save("filterbank", {"filters": fb.numpy()})

# lfilter_via_fsm (one-pole smoother coefficients)
xs = rng.standard_normal((BS, 1, 4096)).astype(np.float32)
alpha = np.array([[0.99], [0.95]], dtype=np.float32)
b = np.concatenate([1 - alpha, np.zeros_like(alpha)], axis=-1)
a = np.concatenate([np.ones_like(alpha), -alpha], axis=-1)
ylf = dasp_pytorch.signal.lfilter_via_fsm(
    torch.from_numpy(xs), torch.from_numpy(b), torch.from_numpy(a)
)
save("lfilter_fsm", {"x": xs, "b": b, "a": a, "y": ylf.numpy()})

# --- auraloss-exact MR-STFT loss fixtures -------------------------------
# auraloss itself is not installed in this image, so the golden side is an
# independent torch+scipy reimplementation of auraloss's documented
# pipeline (auraloss/freq.py STFTLoss/MultiResolutionSTFTLoss and
# auraloss/perceptual.py FIRFilter("aw")): torch.stft magnitudes
# (center/reflect, periodic hann, clamp(1e-8)), per-item spectral
# convergence, L1 log/linear magnitude means, A-weighting prefilter =
# bilinear analog filter -> freqz(512) -> firls(101) -> conv1d(padding=50).
# The JAX loss (dasp_tpu.utils.loss auraloss_compat=True) is then parity-
# tested against these fixtures through a fully independent code path
# (framed matmul/rfft STFT vs torch.stft; lax.conv vs torch conv1d).


def _aw_taps_torch(sample_rate, ntaps=101):
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    num = [(2 * np.pi * f4) ** 2 * (10 ** (a1000 / 20)), 0, 0, 0, 0]
    den = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(num, den, fs=sample_rate)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=sample_rate)
    return scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=sample_rate).astype("float32")


def _stft_mag_torch(x2d, n_fft, hop, win_length, eps=1e-8):
    window = torch.hann_window(win_length, dtype=x2d.dtype)
    spec = torch.stft(x2d, n_fft, hop, win_length, window, return_complex=True)
    return torch.sqrt(torch.clamp(spec.real**2 + spec.imag**2, min=eps))


def _auraloss_stft_loss(y_hat, y, n_fft, hop, win, w_sc, w_log, w_lin,
                        perceptual, sample_rate):
    bs, chs, t = y.shape
    if perceptual:
        taps = torch.from_numpy(_aw_taps_torch(sample_rate)).to(y.dtype).view(1, 1, -1)
        y_hat = torch.nn.functional.conv1d(
            y_hat.reshape(bs * chs, 1, t), taps, padding=taps.shape[-1] // 2
        ).view(bs, chs, -1)
        y = torch.nn.functional.conv1d(
            y.reshape(bs * chs, 1, t), taps, padding=taps.shape[-1] // 2
        ).view(bs, chs, -1)
    mx = _stft_mag_torch(y_hat.reshape(-1, y_hat.shape[-1]), n_fft, hop, win)
    my = _stft_mag_torch(y.reshape(-1, y.shape[-1]), n_fft, hop, win)
    loss = 0.0
    if w_sc:
        sc = torch.norm(my - mx, p="fro", dim=[-2, -1]) / torch.norm(my, p="fro", dim=[-2, -1])
        loss = loss + w_sc * sc.mean()
    if w_log:
        loss = loss + w_log * torch.nn.functional.l1_loss(torch.log(mx), torch.log(my))
    if w_lin:
        loss = loss + w_lin * torch.nn.functional.l1_loss(mx, my)
    return loss


def _auraloss_mrstft(y_hat, y, fft_sizes, hops, wins, w_sc, w_log, w_lin,
                     perceptual=False, sample_rate=None):
    total = 0.0
    for n_fft, hop, win in zip(fft_sizes, hops, wins):
        total = total + _auraloss_stft_loss(
            y_hat, y, n_fft, hop, win, w_sc, w_log, w_lin, perceptual, sample_rate)
    return total / len(fft_sizes)


T_LOSS = 8192
x_hat_np = rng.standard_normal((BS, 2, T_LOSS)).astype(np.float32) * 0.25
x_ref_np = (x_hat_np + rng.standard_normal((BS, 2, T_LOSS)).astype(np.float32) * 0.05)

# (a) auraloss MultiResolutionSTFTLoss() defaults — the style-transfer loss
# (ref style_transfer.py:341): ffts (1024, 2048, 512), hops (120, 240, 50),
# wins (600, 1200, 240), w_sc=1, w_log_mag=1
yh = torch.from_numpy(x_hat_np).requires_grad_(True)
yr = torch.from_numpy(x_ref_np)
loss = _auraloss_mrstft(yh, yr, (1024, 2048, 512), (120, 240, 50), (600, 1200, 240),
                        1.0, 1.0, 0.0)
loss.backward()
save("mrstft_auraloss_default", {
    "y_hat": x_hat_np, "y": x_ref_np,
    "loss": np.float32(loss.item()), "grad_y_hat": yh.grad.numpy(),
})

# (b) the auto_eq/virtual_analog config (ref auto_eq.py:252-262): 7 ffts,
# w_sc=0, lin+log, perceptual_weighting=True (time-domain A-weighting FIR)
yh = torch.from_numpy(x_hat_np).requires_grad_(True)
ffts = (128, 256, 512, 1024, 2048, 4096, 8192)
hops = tuple(n // 2 for n in ffts)
loss = _auraloss_mrstft(yh, yr, ffts, hops, ffts, 0.0, 1.0, 1.0,
                        perceptual=True, sample_rate=SR)
loss.backward()
save("mrstft_auraloss_autoeq", {
    "y_hat": x_hat_np, "y": x_ref_np,
    "loss": np.float32(loss.item()), "grad_y_hat": yh.grad.numpy(),
})

# (b') same config in float64: gradients of the log-magnitude term are
# 1/mag-amplified near the eps clamp, so fp32 grad parity floors around
# ~3e-4 from FFT roundoff alone; the f64 fixture proves the SEMANTICS
# match to 1e-6 while the fp32 test uses a documented looser tolerance
yh64 = torch.from_numpy(x_hat_np.astype(np.float64)).requires_grad_(True)
yr64 = torch.from_numpy(x_ref_np.astype(np.float64))
loss = _auraloss_mrstft(yh64, yr64, ffts, hops, ffts, 0.0, 1.0, 1.0,
                        perceptual=True, sample_rate=SR)
loss.backward()
save("mrstft_auraloss_autoeq_f64", {
    "y_hat": x_hat_np.astype(np.float64), "y": x_ref_np.astype(np.float64),
    "loss": np.float64(loss.item()), "grad_y_hat": yh64.grad.numpy(),
})

print("all fixtures written to", OUT)

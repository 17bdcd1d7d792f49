"""Measure the PyTorch reference's style-transfer step rate on this host.

Runs the reference implementation (/root/reference) through the exact
per-step work of its style-transfer recipe (style_transfer.py:271-370):
random-parameter corruption (EQ -> compressor -> reverb), peak norm +
random gains, A/B split, shared-encoder forward, 4 projectors, the
EQ -> compressor -> reverb -> gain render, MR-STFT loss, backward, Adam
step. auraloss is not installed in this image, so its default
MultiResolutionSTFTLoss (fft 1024/2048/512, sc + log-mag) is replicated
inline in torch.

The result is cached to benchmarks/ref_baseline.json so bench.py does not
re-run torch every round. The reference encoder requires >= ~70k-sample
halves, so it runs at the reference scale (262144-sample clips) at
batch_size=1 and the step time is scaled linearly to the target batch
size (conservative in the reference's favour: CPU batching is sublinear).

Usage: python benchmarks/measure_reference.py [--steps 2] [--batch-size-target 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
import dasp_pytorch  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "ref_baseline.json")


# --- auraloss.freq.MultiResolutionSTFTLoss defaults, replicated ---------
def _stft_mag(x, n_fft, hop, win_len):
    window = torch.hann_window(win_len)
    spec = torch.stft(
        x.reshape(-1, x.shape[-1]), n_fft, hop, win_len,
        window=window, return_complex=True,
    )
    return torch.clamp(spec.abs(), min=1e-8)


def mrstft_loss(y_hat, y):
    total = 0.0
    for n_fft, hop, win in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        m_hat = _stft_mag(y_hat, n_fft, hop, win)
        m = _stft_mag(y, n_fft, hop, win)
        sc = torch.norm(m - m_hat, p="fro") / torch.norm(m, p="fro")
        log_mag = torch.nn.functional.l1_loss(torch.log(m_hat), torch.log(m))
        total = total + sc + log_mag
    return total / 3


# --- the reference's networks (style_transfer.py:25-133), verbatim-shape --
class TCNBlock(torch.nn.Module):
    def __init__(self, cin, cout, k, d):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(cin, cout, k, dilation=d, stride=2)
        self.relu1 = torch.nn.PReLU(cout)
        self.bn1 = torch.nn.BatchNorm1d(cout)
        self.conv2 = torch.nn.Conv1d(cout, cout, k, dilation=1)
        self.relu2 = torch.nn.PReLU(cout)
        self.bn2 = torch.nn.BatchNorm1d(cout)

    def forward(self, x):
        x = self.bn1(self.relu1(self.conv1(x)))
        x = self.bn2(self.relu2(self.conv2(x)))
        return x


class Encoder(torch.nn.Module):
    def __init__(self, embed_dim=512, ch=256):
        super().__init__()
        dil = [1, 2, 4, 8, 16, 1, 2, 4, 8, 16]
        blocks = [TCNBlock(1, ch, 7, dil[0])]
        blocks += [TCNBlock(ch, ch, 7, d) for d in dil[1:]]
        self.blocks = torch.nn.ModuleList(blocks)
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(ch, 256), torch.nn.ReLU(),
            torch.nn.Linear(256, 256), torch.nn.ReLU(),
            torch.nn.Linear(256, embed_dim))

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.mlp(x.mean(dim=-1))


class Projector(torch.nn.Module):
    def __init__(self, embed, nparams):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Linear(embed, 256), torch.nn.ReLU(),
            torch.nn.Linear(256, 256), torch.nn.ReLU(),
            torch.nn.Linear(256, nparams))

    def forward(self, z):
        return torch.sigmoid(self.layers(z))


class StyleModel(torch.nn.Module):
    def __init__(self, sr):
        super().__init__()
        self.equalizer = dasp_pytorch.ParametricEQ(sr)
        self.compressor = dasp_pytorch.Compressor(sr)
        self.reverb = dasp_pytorch.NoiseShapedReverb(sr)
        self.gain = dasp_pytorch.Gain(sr)
        self.encoder = Encoder(512)
        e2 = 512 * 2
        self.p_eq = Projector(e2, self.equalizer.num_params)
        self.p_comp = Projector(e2, self.compressor.num_params)
        self.p_rev = Projector(e2, self.reverb.num_params)
        self.p_gain = Projector(e2, self.gain.num_params)

    def forward(self, inp, ref):
        z = torch.cat((self.encoder(inp), self.encoder(ref)), dim=-1)
        y = inp.clone()
        y = self.equalizer.process_normalized(y, self.p_eq(z))
        y = self.compressor.process_normalized(y, self.p_comp(z))
        y = self.reverb.process_normalized(y, self.p_rev(z))
        y = self.gain.process_normalized(y, self.p_gain(z))
        return y


def step(model, x):
    with torch.no_grad():
        ref = model.equalizer.process_normalized(
            x.clone(), torch.rand(x.shape[0], model.equalizer.num_params))
        ref = model.compressor.process_normalized(
            ref, torch.rand(x.shape[0], model.compressor.num_params))
        ref = model.reverb.process_normalized(
            ref, torch.rand(x.shape[0], model.reverb.num_params))
        peak, _ = torch.max(torch.abs(ref), dim=-1, keepdim=True)
        ref = ref / peak
        ref = ref * torch.pow(10, -torch.rand(x.shape[0], 1, 1) * 24 / 20)
        x = x * torch.pow(10, -torch.rand(x.shape[0], 1, 1) * 24 / 20)
    input_a, _ = torch.chunk(x, 2, dim=-1)
    ref_a, ref_b = torch.chunk(ref, 2, dim=-1)
    out_a = model(input_a, torch.mean(ref_b, dim=1, keepdim=True))
    return mrstft_loss(out_a, ref_a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--length", type=int, default=262144)
    ap.add_argument("--batch-size-target", type=int, default=8)
    args = ap.parse_args()

    torch.manual_seed(0)
    sr = 44100
    model = StyleModel(sr)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(1, 1, args.length) * 0.25

    # one warmup step (allocator, thread pools)
    loss = step(model, x)
    opt.zero_grad(); loss.backward(); opt.step()

    t0 = time.time()
    for _ in range(args.steps):
        loss = step(model, x)
        opt.zero_grad(); loss.backward(); opt.step()
    dt = (time.time() - t0) / args.steps

    bs1_steps_per_sec = 1.0 / dt
    target_steps_per_sec = 1.0 / (dt * args.batch_size_target)  # linear scaling
    result = {
        "host": "cpu-torch",
        "torch_version": torch.__version__,
        "length": args.length,
        "measured_batch_size": 1,
        "target_batch_size": args.batch_size_target,
        "bs1_step_seconds": dt,
        "bs1_steps_per_sec": bs1_steps_per_sec,
        "steps_per_sec_at_target_bs": target_steps_per_sec,
        "note": "reference torch style-transfer step on this host CPU; "
                "bs scaled linearly from bs=1 (favourable to the reference)",
    }
    with open(CACHE, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

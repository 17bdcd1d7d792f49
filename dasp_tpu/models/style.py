"""Style-transfer model: shared encoder + per-effect parameter projectors.

Mirrors the capability of the reference's StyleTransferModel
(style_transfer.py:110-156): encode input and reference, concatenate the
embeddings, project to normalized parameters for an EQ -> compressor ->
reverb -> gain chain, and render. The network is a flax module; the
effect chain is applied functionally (effects are pure functions here,
not owned submodules).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules import Compressor, Gain, NoiseShapedReverb, ParametricEQ
from .tcn import Encoder, ParameterProjector

__all__ = ["StyleTransferNet", "apply_style_chain", "make_style_processors"]


def make_style_processors(
    sample_rate: int,
    reverb_num_samples: int = 65536,
    eq_filter_method: str = "fsm",
    compressor_smoother: str = "fsm",
    reverb_noise_mode: str = "frequency",
    reverb_ir_conv_fn=None,
):
    """The four processors of the style-transfer chain.

    The reverb defaults to spectral-domain noise synthesis here (same
    Gaussian process as the reference's time-domain draw, ~4x cheaper per
    render — see functional.noise_shaped_reverberation ``noise_mode``).
    ``reverb_ir_conv_fn`` plugs a custom signal-with-IR convolution into
    the reverb (e.g. ``parallel.sharded_fft_conv_causal`` bound to a mesh
    for sequence-parallel rendering).
    """
    reverb = NoiseShapedReverb(
        sample_rate,
        num_samples=reverb_num_samples,
        noise_mode=reverb_noise_mode,
        ir_conv_fn=reverb_ir_conv_fn,
    )
    return {
        "equalizer": ParametricEQ(sample_rate, filter_method=eq_filter_method),
        "compressor": Compressor(sample_rate, smoother=compressor_smoother),
        "reverb": reverb,
        "gain": Gain(sample_rate),
    }


class StyleTransferNet(nn.Module):
    """Encoder + four parameter projectors (style_transfer.py:110-133)."""

    embed_dim: int = 512
    ch_dim: int = 256
    num_eq_params: int = 18
    num_comp_params: int = 6
    num_reverb_params: int = 25
    num_gain_params: int = 1
    # shorter encoder for small-scale runs; the default needs >= ~70k samples
    encoder_dilations: tuple = (1, 2, 4, 8, 16, 1, 2, 4, 8, 16)
    # compute dtype for the encoder convolutions (e.g. jnp.bfloat16 for MXU
    # mixed precision; params stay fp32)
    dtype: object = None

    @nn.compact
    def __call__(self, inp: jnp.ndarray, ref: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        encoder = Encoder(self.embed_dim, self.ch_dim, self.encoder_dilations, dtype=self.dtype)
        z_input = encoder(inp, train=train)
        z_ref = encoder(ref, train=train)  # shared weights: same module instance
        z = jnp.concatenate([z_input, z_ref], axis=-1)
        return {
            "equalizer": ParameterProjector(self.num_eq_params)(z),
            "compressor": ParameterProjector(self.num_comp_params)(z),
            "reverb": ParameterProjector(self.num_reverb_params)(z),
            "gain": ParameterProjector(self.num_gain_params)(z),
        }


def apply_style_chain(
    processors: Dict,
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> jnp.ndarray:
    """Render the EQ -> compressor -> reverb -> gain chain
    (style_transfer.py:150-154) with normalized parameter tensors."""
    y = processors["equalizer"].process_normalized(x, params["equalizer"], clip_params=True)
    y = processors["compressor"].process_normalized(y, params["compressor"], clip_params=True)
    y = processors["reverb"].process_normalized(y, params["reverb"], clip_params=True, key=key)
    y = processors["gain"].process_normalized(y, params["gain"], clip_params=True)
    return y

"""Neural networks used by the example applications, in flax.linen.

These mirror the capabilities of the reference's example networks
(blind_estimation.py:14-67, auto_eq.py:100-166, style_transfer.py:25-107):
strided/dilated TCN encoders with BatchNorm and (P)ReLU, mean-pooled into
MLP heads. Audio enters as ``(batch, channels, samples)`` and is
transposed to NWC internally (flax convolution layout).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["TCNBlock", "ParameterNetwork", "Encoder", "ParameterProjector"]


class TCNBlock(nn.Module):
    """Strided dilated conv block: conv(s=2, dil=d) -> act -> BN -> conv -> act -> BN.

    Mirrors the reference block (blind_estimation.py:14-44 uses ReLU,
    auto_eq.py:100-131 / style_transfer.py:25-55 use PReLU).
    ``dtype=jnp.bfloat16`` runs the convolutions in bf16 on the MXU with
    fp32 parameters/statistics (mixed precision).
    """

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    activation: str = "relu"  # "relu" | "prelu"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (batch, length, channels)
        def act(h):
            if self.activation == "prelu":
                return nn.PReLU()(h)
            return nn.relu(h)

        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(2,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(act(x))
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(1,),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(act(x))
        return x


class ParameterNetwork(nn.Module):
    """TCN that maps audio to normalized effect parameters via sigmoid.

    Two presets from the reference:
      * blind estimation (blind_estimation.py:47-67): channels
        (16, 32, 64, 128, 128), kernel 3, dilations 1..16, ReLU, linear head.
      * auto-EQ (auto_eq.py:133-166): 10 blocks of 256 channels, kernel 7,
        dilations (1,2,4,8,16)x2, PReLU, 3-layer MLP head.
    """

    num_control_params: int
    channels: Sequence[int] = (16, 32, 64, 128, 128)
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 2, 4, 8, 16)
    activation: str = "relu"
    mlp_hidden: int = 0  # 0 = single linear head (blind-estimation style)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (batch, channels, samples) -> NWC
        h = jnp.swapaxes(x, 1, 2)
        for ch, d in zip(self.channels, self.dilations):
            h = TCNBlock(ch, self.kernel_size, d, self.activation, self.dtype)(h, train=train)
        h = jnp.mean(h, axis=1)  # aggregate over time
        if self.mlp_hidden:
            h = nn.relu(nn.Dense(self.mlp_hidden, dtype=self.dtype)(h))
            h = nn.relu(nn.Dense(self.mlp_hidden, dtype=self.dtype)(h))
        p = nn.Dense(self.num_control_params)(h.astype(jnp.float32))
        return nn.sigmoid(p)

    @staticmethod
    def blind_estimation(num_params: int) -> "ParameterNetwork":
        return ParameterNetwork(num_params)

    @staticmethod
    def auto_eq(num_params: int, ch_dim: int = 256) -> "ParameterNetwork":
        return ParameterNetwork(
            num_params,
            channels=(ch_dim,) * 10,
            kernel_size=7,
            dilations=(1, 2, 4, 8, 16, 1, 2, 4, 8, 16),
            activation="prelu",
            mlp_hidden=256,
        )


class Encoder(nn.Module):
    """Style-transfer audio encoder: 10-block 256-channel TCN + MLP to an
    embedding (style_transfer.py:58-88).

    Note the VALID strided convolutions shrink the sequence: the default
    10-block kernel-7 stack needs input length >= ~70k samples (the
    reference trains on 131072-sample halves). Pass a shorter ``dilations``
    tuple for small-scale runs/tests.
    """

    embed_dim: int = 512
    ch_dim: int = 256
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 1, 2, 4, 8, 16)
    kernel_size: int = 7
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = jnp.swapaxes(x, 1, 2)
        for d in self.dilations:
            h = TCNBlock(self.ch_dim, self.kernel_size, d, "prelu", self.dtype)(h, train=train)
        h = jnp.mean(h.astype(jnp.float32), axis=1)
        h = nn.relu(nn.Dense(256)(h))
        h = nn.relu(nn.Dense(256)(h))
        return nn.Dense(self.embed_dim)(h)


class ParameterProjector(nn.Module):
    """MLP from a (joint) embedding to sigmoid-normalized effect params
    (style_transfer.py:91-107)."""

    num_control_params: int
    num_hidden: int = 256

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.num_hidden)(z))
        h = nn.relu(nn.Dense(self.num_hidden)(h))
        return nn.sigmoid(nn.Dense(self.num_control_params)(h))

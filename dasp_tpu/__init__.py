"""dasp_tpu — differentiable audio signal processors, TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``dasp-pytorch`` (reference: /root/reference): differentiable audio
effects over ``(batch, channels, samples)`` arrays, a normalized-parameter
Processor layer for neural control, training recipes (blind estimation,
auto-EQ, virtual analog, style transfer), plus TPU-first additions the
reference lacks: exact scan-based IIR filters, FFT-domain reverb
convolution, pjit/shard_map multi-device parallelism, tests and
benchmarks.

The public surface mirrors dasp_pytorch/__init__.py:1-19 and adds the
effects the reference declares but stubs (expander, graphic_eq,
advanced_distortion).
"""

__version__ = "0.1.0"

from dasp_tpu.functional import (
    gain,
    stereo_bus,
    stereo_panner,
    stereo_widener,
    noise_shaped_reverberation,
    compressor,
    expander,
    sidechain_compressor,
    noise_gate,
    de_esser,
    bitcrusher,
    distortion,
    advanced_distortion,
    graphic_eq,
    parametric_eq,
    delay,
    modulated_delay,
    pitch_shift,
    transient_shaper,
    exciter,
    spectral_gate,
    spectral_noise_profile,
    tremolo,
    phaser,
    auto_wah,
    limiter,
    multiband_compressor,
)

from dasp_tpu.modules import (
    Processor,
    Chain,
    Compressor,
    Expander,
    SidechainCompressor,
    NoiseGate,
    DeEsser,
    Bitcrusher,
    ParametricEQ,
    GraphicEQ,
    NoiseShapedReverb,
    Gain,
    Distortion,
    AdvancedDistortion,
    StereoWidener,
    StereoPanner,
    StereoBus,
    Delay,
    Chorus,
    PitchShift,
    TransientShaper,
    Exciter,
    SpectralGate,
    Flanger,
    Tremolo,
    Phaser,
    AutoWah,
    Limiter,
    MultibandCompressor,
)

from dasp_tpu import ops
from dasp_tpu import functional
from dasp_tpu import streaming

__all__ = [
    "gain",
    "stereo_bus",
    "stereo_panner",
    "stereo_widener",
    "noise_shaped_reverberation",
    "compressor",
    "expander",
    "sidechain_compressor",
    "noise_gate",
    "de_esser",
    "bitcrusher",
    "distortion",
    "advanced_distortion",
    "graphic_eq",
    "parametric_eq",
    "delay",
    "modulated_delay",
    "pitch_shift",
    "transient_shaper",
    "exciter",
    "spectral_gate",
    "spectral_noise_profile",
    "tremolo",
    "phaser",
    "auto_wah",
    "limiter",
    "multiband_compressor",
    "Processor",
    "Chain",
    "Compressor",
    "Expander",
    "SidechainCompressor",
    "NoiseGate",
    "DeEsser",
    "Bitcrusher",
    "ParametricEQ",
    "GraphicEQ",
    "NoiseShapedReverb",
    "Gain",
    "Distortion",
    "AdvancedDistortion",
    "StereoWidener",
    "StereoPanner",
    "StereoBus",
    "Delay",
    "Chorus",
    "PitchShift",
    "TransientShaper",
    "Exciter",
    "SpectralGate",
    "Flanger",
    "Tremolo",
    "Phaser",
    "AutoWah",
    "Limiter",
    "MultibandCompressor",
    "ops",
    "functional",
]

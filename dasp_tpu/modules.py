"""Processor layer: normalized-parameter dispatch for neural control.

TPU-native counterpart of the reference's dasp_pytorch/modules.py. A
``Processor`` owns a parameter-range table and turns a dense
``(batch, num_params)`` tensor of normalized (0, 1) parameters — e.g. the
sigmoid output of a parameter-estimation network — into keyword arguments
for the underlying functional effect.

Processors hold only static configuration (sample rate, ranges, the
effect function); they contain no arrays, so bound methods like
``process_normalized`` trace cleanly under jit/grad with no pytree
ceremony.

Differences vs the reference (deliberate):
  * ``Distortion`` is fixed: it takes ``sample_rate`` and uses the
    parameter name ``drive_db``. The reference's version is broken on both
    counts (modules.py:110-121 — no sample_rate attribute, and the kwarg
    ``gain_db`` does not match ``functional.distortion``'s ``drive_db``).
  * Out-of-range check: the reference raises ValueError on data-dependent
    values (modules.py:83-84), which cannot run under jit. Here the check
    runs eagerly on concrete inputs and is skipped for traced ones;
    ``clip_params=True`` instead clamps into [0, 1] (trace-safe).
  * Extra processors for the effects the reference stubs or never wraps:
    ``Expander``, ``GraphicEQ``, ``AdvancedDistortion``, ``StereoWidener``,
    ``StereoPanner``, ``StereoBus``.
"""

from __future__ import annotations

import functools

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import functional as F

__all__ = [
    "normalize",
    "denormalize",
    "Processor",
    "Chain",
    "Gain",
    "Distortion",
    "AdvancedDistortion",
    "ParametricEQ",
    "GraphicEQ",
    "Compressor",
    "Expander",
    "SidechainCompressor",
    "NoiseGate",
    "DeEsser",
    "Bitcrusher",
    "TransientShaper",
    "Exciter",
    "SpectralGate",
    "Clipper",
    "ConvolutionReverb",
    "NoiseShapedReverb",
    "StereoWidener",
    "StereoPanner",
    "StereoBus",
    "Delay",
    "Chorus",
    "Flanger",
    "PitchShift",
    "TimeStretch",
    "PitchShiftPV",
    "Tremolo",
    "RingModulator",
    "StereoImager",
    "WowFlutter",
    "DynamicEQ",
    "Phaser",
    "AutoWah",
    "Limiter",
    "MultibandCompressor",
]


def denormalize(norm_val, max_val, min_val):
    """Map a normalized (0, 1) value onto [min_val, max_val].

    Reference: dasp_pytorch/modules.py:13-14 (same argument order).
    """
    return (norm_val * (max_val - min_val)) + min_val


def normalize(val, min_val, max_val):
    """Map a value from [min_val, max_val] onto (0, 1).

    Reference: dasp_pytorch/modules.py:17-18.
    """
    return (val - min_val) / (max_val - min_val)


def _snapshot_arg(v):
    """Freeze a constructor argument for ``_init_spec`` recording.

    Lists/tuples are snapshotted element-wise into tuples and one-shot
    iterators are materialized (so presets don't serialize a spec the
    caller has since mutated or exhausted); scalars, strings, arrays and
    Processor instances pass through by reference.
    """
    if isinstance(v, (str, bytes)) or hasattr(v, "shape"):
        return v
    if isinstance(v, dict):
        return {k: _snapshot_arg(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return tuple(_snapshot_arg(x) for x in v)
    if hasattr(v, "__next__"):  # one-shot iterator/generator
        return tuple(v)
    return v


class Processor:
    """Base class: named parameter ranges + normalized-tensor dispatch.

    Reference: dasp_pytorch/modules.py:21-91. Subclasses set
    ``sample_rate``, ``process_fn`` and ``param_ranges``.
    """

    sample_rate: int
    process_fn: Callable
    param_ranges: Dict[str, Tuple[float, float]]
    # True for processors whose functional form consumes a PRNG key.
    stochastic: bool = False
    # names of side-input kwargs (e.g. "sidechain", "ir") this processor
    # needs; Chain.process_normalized forwards exactly these to it
    consumes_kwargs: Tuple[str, ...] = ()

    def __init__(self):
        pass

    def __init_subclass__(cls, **kw):
        """Record each instance's constructor arguments (`_init_spec`)
        so utils.presets can serialize a configured processor/chain to
        JSON and rebuild it. The most-derived ``__init__`` wins (it runs
        first); ``super().__init__()`` chains never overwrite it."""
        super().__init_subclass__(**kw)
        if "__init__" in cls.__dict__:
            orig = cls.__dict__["__init__"]

            @functools.wraps(orig)
            def wrapped(self, *a, __orig=orig, **k):
                if not hasattr(self, "_init_spec"):
                    # Snapshot sequence args (one-shot iterators, lists the
                    # caller mutates later) so the recorded spec stays equal
                    # to what __init__ actually consumed.
                    a = tuple(_snapshot_arg(v) for v in a)
                    k = {kk: _snapshot_arg(v) for kk, v in k.items()}
                    self._init_spec = (type(self).__name__, a, dict(k))
                    __orig(self, *a, **k)
                else:
                    __orig(self, *a, **k)

            cls.__init__ = wrapped

    @property
    def num_params(self) -> int:
        return len(self.param_ranges)

    def process_normalized(
        self,
        x: jnp.ndarray,
        param_tensor: jnp.ndarray,
        clip_params: bool = False,
        **kwargs,
    ) -> jnp.ndarray:
        """Run the processor from a (batch, num_params) normalized tensor.

        Parameters occupy columns in ``param_ranges`` declaration order.
        Reference: dasp_pytorch/modules.py:25-51.

        Args:
            x: input audio, shape (bs, chs, seq_len).
            param_tensor: normalized parameters on (0, 1),
                shape (bs, num_params).
            clip_params: clamp parameters into [0, 1] instead of validating
                (trace-safe; useful when a network output may overshoot).
            **kwargs: forwarded to the functional effect (e.g. ``key=`` for
                stochastic processors like :class:`NoiseShapedReverb`).

        Returns:
            Output audio.
        """
        if clip_params:
            param_tensor = jnp.clip(param_tensor, 0.0, 1.0)
        param_dict = self.extract_param_dict(param_tensor)
        denorm = self.denormalize_param_dict(param_dict, validate=not clip_params)
        return self.process_fn(x, self.sample_rate, **denorm, **kwargs)

    def process(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        """Raw passthrough to the functional effect (denormalized params)."""
        return self.process_fn(x, *args, **kwargs)

    def extract_param_dict(self, param_tensor: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Split a (bs, num_params) tensor into named columns.

        Reference: dasp_pytorch/modules.py:56-68.
        """
        if param_tensor.shape[1] != len(self.param_ranges):
            raise ValueError(
                f"Parameter tensor has {param_tensor.shape[1]} parameters, "
                f"but processor has {len(self.param_ranges)} parameters."
            )
        return {
            name: param_tensor[:, idx]
            for idx, name in enumerate(self.param_ranges.keys())
        }

    def denormalize_param_dict(
        self, param_dict: Dict[str, jnp.ndarray], validate: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """Map normalized (0, 1) parameters onto their declared ranges.

        Reference: dasp_pytorch/modules.py:70-91. The out-of-range check
        only runs on concrete (non-traced) values — under jit it is a
        no-op, because data-dependent raising is impossible in a compiled
        program.
        """
        out = {}
        for name, p in param_dict.items():
            if validate and not isinstance(p, jax.core.Tracer):
                import numpy as np

                pv = np.asarray(p)
                if pv.min() < 0 or pv.max() > 1:
                    raise ValueError(f"Parameter {name} is out of range.")
            lo, hi = self.param_ranges[name]
            out[name] = denormalize(p, hi, lo)
        return out


class Chain(Processor):
    """Serial composition of processors driven by ONE parameter tensor.

    Every reference application builds its effect chain by hand (e.g. the
    EQ -> compressor -> reverb -> gain render of style_transfer.py:150-154);
    ``Chain`` packages that pattern: a network emits one
    ``(bs, sum(num_params))`` tensor and the chain slices consecutive column
    groups to each processor in order. Stochastic processors (e.g.
    :class:`NoiseShapedReverb`) each receive a key derived from the single
    ``key=`` argument via ``jax.random.fold_in`` (position-stable, so adding
    a parameter elsewhere never reshuffles another processor's noise).

    Example::

        chain = Chain([ParametricEQ(sr), Compressor(sr), NoiseShapedReverb(sr), Gain(sr)])
        y = chain.process_normalized(x, p, clip_params=True, key=key)  # p: (bs, 50)
    """

    def __init__(self, processors: Sequence[Processor]):
        super().__init__()
        if not processors:
            raise ValueError("Chain requires at least one processor.")
        self.processors = list(processors)
        self.sample_rate = self.processors[0].sample_rate
        self.stochastic = any(p.stochastic for p in self.processors)
        # prefixed merged ranges, for introspection and num_params
        self.param_ranges = {
            f"p{i}.{name}": rng
            for i, p in enumerate(self.processors)
            for name, rng in p.param_ranges.items()
        }

    def process_normalized(
        self,
        x: jnp.ndarray,
        param_tensor: jnp.ndarray,
        clip_params: bool = False,
        key: Optional[jax.Array] = None,
        **kwargs,
    ) -> jnp.ndarray:
        """Extra ``**kwargs`` (e.g. ``noise=`` for deterministic reverb
        injection) are forwarded to the STOCHASTIC processors; named
        side inputs (``sidechain=``, ``ir=``, ``noise_profile_db=``) are
        forwarded exactly to the members declaring them in
        ``consumes_kwargs``. Other members never see them."""
        if param_tensor.shape[1] != self.num_params:
            raise ValueError(
                f"Parameter tensor has {param_tensor.shape[1]} parameters, "
                f"but processor has {self.num_params} parameters."
            )
        if self.stochastic and key is None and "noise" not in kwargs:
            raise ValueError(
                "Chain contains a stochastic processor: pass key= (or noise=)."
            )
        y = x
        col = 0
        for i, p in enumerate(self.processors):
            cols = param_tensor[:, col : col + p.num_params]
            col += p.num_params
            kw = {
                name: kwargs[name]
                for name in p.consumes_kwargs
                if name in kwargs
            }
            if p.stochastic and key is not None:
                kw["key"] = jax.random.fold_in(key, i)
            y = p.process_normalized(y, cols, clip_params=clip_params, **kw)
        return y

    def process(self, x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        raise NotImplementedError(
            "Chain has no single functional form; use process_normalized."
        )


class Gain(Processor):
    """Gain in dB. Reference: dasp_pytorch/modules.py:94-107."""

    def __init__(self, sample_rate: int, min_gain_db: float = -24.0, max_gain_db: float = 24.0):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.gain
        self.param_ranges = {"gain_db": (min_gain_db, max_gain_db)}


class Distortion(Processor):
    """Soft-clip distortion. Reference: dasp_pytorch/modules.py:110-121
    (with its two bugs fixed — see module docstring)."""

    def __init__(self, sample_rate: int, min_drive_db: float = 0.0, max_drive_db: float = 24.0):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.distortion
        self.param_ranges = {"drive_db": (min_drive_db, max_drive_db)}


class AdvancedDistortion(Processor):
    """Distortion with gain staging, tone and dc offset (reference stub
    dasp_pytorch/functional.py:81-111, implemented here)."""

    def __init__(
        self,
        sample_rate: int,
        min_gain_db: float = 0.0,
        max_gain_db: float = 24.0,
        min_dc_offset: float = -0.1,
        max_dc_offset: float = 0.1,
        filter_method: str = "block",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        # *a keeps Processor.process's raw positional passthrough working;
        # the dict merge makes the constructor value a default the caller
        # can still override per call
        self.process_fn = lambda x, *a, **kw: F.advanced_distortion(
            x, *a, **{"filter_method": filter_method, **kw}
        )
        self.param_ranges = {
            "input_gain_db": (min_gain_db, max_gain_db),
            "output_gain_db": (-max_gain_db, 0.0),
            "tone": (0.0, 1.0),
            "dc_offset": (min_dc_offset, max_dc_offset),
        }


class ParametricEQ(Processor):
    """Six-band parametric EQ. Reference: dasp_pytorch/modules.py:124-156
    (same staggered per-band cutoff ranges)."""

    def __init__(
        self,
        sample_rate: int,
        min_gain_db: float = -20.0,
        max_gain_db: float = 20.0,
        min_q_factor: float = 0.1,
        max_q_factor: float = 6.0,
        filter_method: str = "fsm",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.parametric_eq(
            x, *a, **{"filter_method": filter_method, **kw}
        )
        self.param_ranges = {
            "low_shelf_gain_db": (min_gain_db, max_gain_db),
            "low_shelf_cutoff_freq": (20, 2000),
            "low_shelf_q_factor": (min_q_factor, max_q_factor),
            "band0_gain_db": (min_gain_db, max_gain_db),
            "band0_cutoff_freq": (80, 2000),
            "band0_q_factor": (min_q_factor, max_q_factor),
            "band1_gain_db": (min_gain_db, max_gain_db),
            "band1_cutoff_freq": (2000, 8000),
            "band1_q_factor": (min_q_factor, max_q_factor),
            "band2_gain_db": (min_gain_db, max_gain_db),
            "band2_cutoff_freq": (8000, 12000),
            "band2_q_factor": (min_q_factor, max_q_factor),
            "band3_gain_db": (min_gain_db, max_gain_db),
            "band3_cutoff_freq": (12000, (sample_rate // 2) - 1000),
            "band3_q_factor": (min_q_factor, max_q_factor),
            "high_shelf_gain_db": (min_gain_db, max_gain_db),
            "high_shelf_cutoff_freq": (4000, (sample_rate // 2) - 1000),
            "high_shelf_q_factor": (min_q_factor, max_q_factor),
        }


class GraphicEQ(Processor):
    """Ten-band octave graphic EQ (reference stub
    dasp_pytorch/functional.py:114-115, implemented here)."""

    def __init__(
        self,
        sample_rate: int,
        min_gain_db: float = -12.0,
        max_gain_db: float = 12.0,
        filter_method: str = "coupled",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.param_ranges = {
            f"band{i}_gain_db": (min_gain_db, max_gain_db)
            for i in range(len(F.GRAPHIC_EQ_BANDS))
        }

        def _process(x, sr, *args, **kw):
            fm = kw.pop("filter_method", filter_method)
            if args:  # raw positional passthrough: graphic_eq(x, sr, gains)
                return F.graphic_eq(x, sr, *args, filter_method=fm, **kw)
            gains = jnp.stack(
                [kw.pop(f"band{i}_gain_db") for i in range(len(F.GRAPHIC_EQ_BANDS))],
                axis=-1,
            )
            return F.graphic_eq(x, sr, gains, filter_method=fm, **kw)

        self.process_fn = _process


class Compressor(Processor):
    """Feed-forward compressor. Reference: dasp_pytorch/modules.py:159-187."""

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_attack_ms: float = 5.0,
        max_attack_ms: float = 100.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 100.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        min_makeup_gain_db: float = 0.0,
        max_makeup_gain_db: float = 12.0,
        smoother: str = "fsm",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.compressor(x, *a, **{"smoother": smoother, **kw})
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
            "makeup_gain_db": (min_makeup_gain_db, max_makeup_gain_db),
        }


class Expander(Processor):
    """Downward expander (reference stub dasp_pytorch/functional.py:402-403,
    implemented here as the compressor's dual)."""

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_attack_ms: float = 5.0,
        max_attack_ms: float = 100.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 100.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        min_makeup_gain_db: float = 0.0,
        max_makeup_gain_db: float = 12.0,
        smoother: str = "exact_pallas",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.expander(x, *a, **{"smoother": smoother, **kw})
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
            "makeup_gain_db": (min_makeup_gain_db, max_makeup_gain_db),
        }


class SidechainCompressor(Processor):
    """Compressor keyed by an external sidechain signal — a ducker
    (functional.sidechain_compressor). The key signal is NOT a parameter:
    pass it through ``process_normalized(x, p, sidechain=key_audio)``,
    the same forwarding contract as the reverb's ``key=``."""

    consumes_kwargs = ("sidechain",)

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_attack_ms: float = 5.0,
        max_attack_ms: float = 100.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 500.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        min_makeup_gain_db: float = 0.0,
        max_makeup_gain_db: float = 12.0,
        smoother: str = "exact_pallas",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.sidechain_compressor(
            x, *a, **{"smoother": smoother, **kw}
        )
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
            "makeup_gain_db": (min_makeup_gain_db, max_makeup_gain_db),
        }


class NoiseGate(Processor):
    """Noise gate: range-limited downward expander with gate-convention
    ballistics and optional hold (functional.noise_gate). ``hold_ms`` is
    a static constructor setting (the hold window is a compiled shape),
    not a learnable column."""

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -80.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_range_db: float = 0.0,
        max_range_db: float = 80.0,
        min_attack_ms: float = 0.05,
        max_attack_ms: float = 20.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 500.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        hold_ms: float = 0.0,
        smoother: str = "exact_pallas",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.noise_gate(
            x, *a, **{"smoother": smoother, "hold_ms": hold_ms, **kw}
        )
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "range_db": (min_range_db, max_range_db),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
        }


class DeEsser(Processor):
    """Frequency-selective sibilance compressor (functional.de_esser).
    ``mode`` ("split"/"wideband") is a static constructor setting."""

    def __init__(
        self,
        sample_rate: int,
        min_frequency_hz: float = 2000.0,
        max_frequency_hz: float = 12000.0,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_attack_ms: float = 0.5,
        max_attack_ms: float = 20.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 200.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        mode: str = "split",
        smoother: str = "exact_pallas",
        filter_method: str = "coupled",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.de_esser(
            x, *a,
            **{"mode": mode, "smoother": smoother,
               "filter_method": filter_method, **kw},
        )
        self.param_ranges = {
            "frequency_hz": (min_frequency_hz, max_frequency_hz),
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
        }


class Bitcrusher(Processor):
    """Lo-fi bit-depth + sample-rate reduction (functional.bitcrusher)."""

    def __init__(
        self,
        sample_rate: int,
        min_bit_depth: float = 2.0,
        max_bit_depth: float = 16.0,
        min_sample_rate_hz: float = 1000.0,
        max_sample_rate_hz: float = 44100.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.bitcrusher
        self.param_ranges = {
            "bit_depth": (min_bit_depth, max_bit_depth),
            "sample_rate_hz": (min_sample_rate_hz, max_sample_rate_hz),
            "mix": (min_mix, max_mix),
        }


class TransientShaper(Processor):
    """Threshold-free attack/sustain control (functional.transient_shaper).

    ``attack``, ``sustain`` and ``output_gain_db`` are learnable;
    detector ballistics and the smoother are static constructor
    settings."""

    def __init__(
        self,
        sample_rate: int,
        min_attack: float = -1.0,
        max_attack: float = 1.0,
        min_sustain: float = -1.0,
        max_sustain: float = 1.0,
        min_output_gain_db: float = -12.0,
        max_output_gain_db: float = 12.0,
        smoother: str = "parallel",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.transient_shaper(
            x, *a, **{"smoother": smoother, **kw}
        )
        self.param_ranges = {
            "attack": (min_attack, max_attack),
            "sustain": (min_sustain, max_sustain),
            "output_gain_db": (min_output_gain_db, max_output_gain_db),
        }


class Exciter(Processor):
    """Harmonic exciter / aural enhancer (functional.exciter)."""

    def __init__(
        self,
        sample_rate: int,
        min_frequency_hz: float = 1000.0,
        max_frequency_hz: float = 10000.0,
        min_drive_db: float = 0.0,
        max_drive_db: float = 24.0,
        min_amount: float = 0.0,
        max_amount: float = 1.0,
        filter_method: str = "coupled",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.exciter(
            x, *a, **{"filter_method": filter_method, **kw}
        )
        self.param_ranges = {
            "frequency_hz": (min_frequency_hz, max_frequency_hz),
            "drive_db": (min_drive_db, max_drive_db),
            "amount": (min_amount, max_amount),
        }


class SpectralGate(Processor):
    """Spectral noise gate / denoiser (functional.spectral_gate).

    ``threshold_db``, ``range_db``, ``attack_ms``, ``release_ms`` are
    learnable; frame layout, sharpness and the noise-profile policy are
    static constructor settings (pass ``noise_profile_db=`` through
    ``process_normalized`` kwargs for a measured floor)."""

    consumes_kwargs = ("noise_profile_db",)

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = 0.0,
        max_threshold_db: float = 24.0,
        min_range_db: float = 0.0,
        max_range_db: float = 60.0,
        min_attack_ms: float = 1.0,
        max_attack_ms: float = 50.0,
        min_release_ms: float = 20.0,
        max_release_ms: float = 500.0,
        sharpness_db: float = 3.0,
        frame_size: int = 2048,
        hop: int = 512,
        smoother: str = "parallel",
        tv_power_fn=None,
        tv_filter_fn=None,
    ):
        """``tv_power_fn`` / ``tv_filter_fn`` plug sequence-parallel WOLA
        implementations into the effect (e.g. ``parallel.sharded_tv_power``
        / ``parallel.sharded_tv_freq_filter`` bound to a mesh)."""
        super().__init__()
        self.sample_rate = sample_rate
        defaults = {
            "sharpness_db": sharpness_db, "frame_size": frame_size,
            "hop": hop, "smoother": smoother,
        }
        if tv_power_fn is not None:
            defaults["tv_power_fn"] = tv_power_fn
        if tv_filter_fn is not None:
            defaults["tv_filter_fn"] = tv_filter_fn
        self.process_fn = lambda x, *a, **kw: F.spectral_gate(
            x, *a, **{**defaults, **kw}
        )
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "range_db": (min_range_db, max_range_db),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
        }


class Clipper(Processor):
    """Hard/soft clipper with a learnable ceiling (functional.clipper)."""

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -24.0,
        max_threshold_db: float = 0.0,
        min_hardness: float = 0.0,
        max_hardness: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.clipper
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "hardness": (min_hardness, max_hardness),
        }


class ConvolutionReverb(Processor):
    """User-IR convolution reverb (functional.convolution_reverb).

    ``mix`` is the learnable parameter; pass the impulse response
    through ``process_normalized(..., ir=...)`` kwargs (it may itself
    be a trainable tensor — gradients flow into it)."""

    consumes_kwargs = ("ir",)

    def __init__(
        self,
        sample_rate: int,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
        block: Optional[int] = None,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.convolution_reverb(
            x, *a, **{"block": block, **kw}
        )
        self.param_ranges = {"mix": (min_mix, max_mix)}


class NoiseShapedReverb(Processor):
    """Filtered-noise-shaping reverb.
    Reference: dasp_pytorch/modules.py:190-231. ``process_normalized``
    requires ``key=`` (or ``noise=``) since the effect is stochastic."""

    stochastic = True
    consumes_kwargs = ("noise",)

    def __init__(
        self,
        sample_rate: int,
        min_band_gain: float = 0.0,
        max_band_gain: float = 1.0,
        min_band_decay: float = 0.0,
        max_band_decay: float = 1.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
        num_samples: int = 65536,
        num_bandpass_taps: int = 1023,
        noise_mode: str = "time",
        ir_conv_fn=None,
    ):
        """``ir_conv_fn`` plugs a custom signal-with-IR convolution into
        the effect (e.g. ``parallel.sharded_fft_conv_causal`` bound to a
        mesh, for sequence-parallel rendering)."""
        super().__init__()
        self.sample_rate = sample_rate
        defaults = {
            "num_samples": num_samples,
            "num_bandpass_taps": num_bandpass_taps,
            "noise_mode": noise_mode,
        }
        if ir_conv_fn is not None:
            defaults["ir_conv_fn"] = ir_conv_fn
        self.process_fn = lambda x, *a, **kw: F.noise_shaped_reverberation(
            x, *a, **{**defaults, **kw}
        )
        ranges = {}
        for i in range(12):
            ranges[f"band{i}_gain"] = (min_band_gain, max_band_gain)
        for i in range(12):
            ranges[f"band{i}_decay"] = (min_band_decay, max_band_decay)
        ranges["mix"] = (min_mix, max_mix)
        self.param_ranges = ranges


class StereoWidener(Processor):
    """Mid/side stereo widener (functional.py:580-604 wrapped as a
    Processor — the reference never wraps its stereo effects)."""

    def __init__(self, sample_rate: int, min_width: float = 0.0, max_width: float = 1.0):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.stereo_widener
        self.param_ranges = {"width": (min_width, max_width)}


class StereoPanner(Processor):
    """Constant-power stereo panner for a single mono track."""

    def __init__(self, sample_rate: int, min_pan: float = 0.0, max_pan: float = 1.0):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.stereo_panner
        self.param_ranges = {"pan": (min_pan, max_pan)}


class StereoBus(Processor):
    """Stereo bus with per-track sends for a fixed number of tracks."""

    def __init__(
        self,
        sample_rate: int,
        num_tracks: int,
        min_send_db: float = -80.0,
        max_send_db: float = 12.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.num_tracks = num_tracks
        self.param_ranges = {
            f"track{i}_send_db": (min_send_db, max_send_db) for i in range(num_tracks)
        }

        def _process(x, sr, *args, **sends):
            if args:  # raw positional passthrough: stereo_bus(x, sr, send_db)
                return F.stereo_bus(x, sr, *args, **sends)
            send_db = jnp.stack(
                [sends[f"track{i}_send_db"] for i in range(num_tracks)], axis=-1
            )
            return F.stereo_bus(x, sr, send_db)

        self.process_fn = _process


class Delay(Processor):
    """Feedback delay (echo) with a continuous delay time.

    Wraps :func:`functional.delay` (closed-form comb over rFFT bins; not
    in the reference's processor set)."""

    def __init__(
        self,
        sample_rate: int,
        min_delay_ms: float = 10.0,
        max_delay_ms: float = 1000.0,
        min_feedback: float = 0.0,
        max_feedback: float = 0.9,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.delay
        self.param_ranges = {
            "delay_ms": (min_delay_ms, max_delay_ms),
            "feedback": (min_feedback, max_feedback),
            "mix": (min_mix, max_mix),
        }


class _ModulatedDelay(Processor):
    """Shared body for Chorus/Flanger: LFO-modulated fractional delay.

    The declared ranges bound the total delay statically, so the wrapper
    always drives :func:`functional.modulated_delay`'s MXU path
    (``max_delay_ms = max_base + max_depth`` — per-tile interpolation
    matmuls instead of TPU gathers)."""

    def __init__(
        self,
        sample_rate: int,
        min_rate_hz: float,
        max_rate_hz: float,
        min_depth_ms: float,
        max_depth_ms: float,
        min_base_ms: float,
        max_base_ms: float,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        max_total_ms = max_base_ms + max_depth_ms
        self.process_fn = lambda x, *a, **kw: F.modulated_delay(
            x, *a, **{"max_delay_ms": max_total_ms, **kw}
        )
        self.param_ranges = {
            "rate_hz": (min_rate_hz, max_rate_hz),
            "depth_ms": (min_depth_ms, max_depth_ms),
            "base_ms": (min_base_ms, max_base_ms),
            "mix": (min_mix, max_mix),
        }


class Chorus(_ModulatedDelay):
    """Chorus: slow LFO, long base delay (~20 ms), moderate depth."""

    def __init__(
        self,
        sample_rate: int,
        min_rate_hz: float = 0.1,
        max_rate_hz: float = 3.0,
        min_depth_ms: float = 1.0,
        max_depth_ms: float = 10.0,
        min_base_ms: float = 15.0,
        max_base_ms: float = 35.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__(
            sample_rate,
            min_rate_hz, max_rate_hz,
            min_depth_ms, max_depth_ms,
            min_base_ms, max_base_ms,
            min_mix, max_mix,
        )


class Flanger(_ModulatedDelay):
    """Flanger: short base delay (<5 ms) so the comb notches sweep audibly."""

    def __init__(
        self,
        sample_rate: int,
        min_rate_hz: float = 0.05,
        max_rate_hz: float = 2.0,
        min_depth_ms: float = 0.5,
        max_depth_ms: float = 5.0,
        min_base_ms: float = 0.1,
        max_base_ms: float = 2.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__(
            sample_rate,
            min_rate_hz, max_rate_hz,
            min_depth_ms, max_depth_ms,
            min_base_ms, max_base_ms,
            min_mix, max_mix,
        )


class PitchShift(Processor):
    """Dual-tap delay-line pitch shifter (functional.pitch_shift).

    ``semitones`` and ``mix`` are learnable normalized parameters;
    ``window_ms`` is a static constructor setting."""

    def __init__(
        self,
        sample_rate: int,
        min_semitones: float = -12.0,
        max_semitones: float = 12.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
        window_ms: float = 60.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.pitch_shift(
            x, *a, **{"window_ms": window_ms, **kw}
        )
        self.param_ranges = {
            "semitones": (min_semitones, max_semitones),
            "mix": (min_mix, max_mix),
        }


class TimeStretch(Processor):
    """Phase-vocoder time stretch with a LEARNABLE rate
    (functional.time_stretch in its fixed-output-length mode).

    The output keeps the input's length — an interior time-warp: the
    synthesis track reads the analysis track at ``j * rate``, clipping
    (and freezing) at the final frame when ``rate > 1`` runs off the
    end. ``rate`` gradients flow through the warp's hat-interpolation
    matrices, so the stretch factor trains like any other parameter."""

    def __init__(
        self,
        sample_rate: int,
        min_rate: float = 0.5,
        max_rate: float = 2.0,
        frame_size: int = 2048,
        hop: int = 512,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.time_stretch(
            x, *a,
            **{"frame_size": frame_size, "hop": hop,
               "out_len": x.shape[-1], **kw},
        )
        self.param_ranges = {"rate": (min_rate, max_rate)}


class PitchShiftPV(Processor):
    """Phase-vocoder pitch shifter with a LEARNABLE shift
    (functional.pitch_shift_pv in its differentiable mode) — the
    higher-fidelity counterpart of :class:`PitchShift` (no periodic
    crossfade comb; costs a PV round trip plus one resampling gather).

    The intermediate stretch buffer is sized for ``max_semitones``
    (static), so raising the ceiling costs memory/compute even for
    small shifts."""

    def __init__(
        self,
        sample_rate: int,
        min_semitones: float = -12.0,
        max_semitones: float = 12.0,
        frame_size: int = 2048,
        hop: int = 512,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.pitch_shift_pv(
            x, *a,
            **{"frame_size": frame_size, "hop": hop,
               "max_semitones": max_semitones, **kw},
        )
        self.param_ranges = {"semitones": (min_semitones, max_semitones)}


class DynamicEQ(Processor):
    """N-band dynamic EQ (functional.dynamic_eq).

    ``num_bands`` is static; the flat normalized tensor holds
    ``num_bands * 6`` columns in band-major order
    (band0_frequency_hz .. band0_release_ms, band1_..., ...). Default
    band frequency ranges are staggered low/mid/high like
    :class:`ParametricEQ`."""

    def __init__(
        self,
        sample_rate: int,
        num_bands: int = 3,
        min_q: float = 0.5,
        max_q: float = 8.0,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 10.0,
        min_attack_ms: float = 1.0,
        max_attack_ms: float = 100.0,
        min_release_ms: float = 10.0,
        max_release_ms: float = 500.0,
        knee_db: float = 6.0,
        max_cut_db: float = 24.0,
        frame_size: int = 1024,
        hop: int = 256,
        smoother: str = "parallel",
        tv_power_fn=None,
        tv_filter_fn=None,
    ):
        """``tv_power_fn`` / ``tv_filter_fn`` plug sequence-parallel WOLA
        implementations into the effect (see :class:`SpectralGate`)."""
        super().__init__()
        self.sample_rate = sample_rate
        self.num_bands = num_bands
        # stagger band frequency ranges across the spectrum; start at
        # 40 Hz — lower bells with high Q outrun the WOLA tail room
        # (see functional.dynamic_eq's truncation note)
        edges = [
            40.0 * (0.5 * sample_rate / 40.0) ** (i / num_bands)
            for i in range(num_bands + 1)
        ]
        names = ("frequency_hz", "q_factor", "threshold_db", "ratio",
                 "attack_ms", "release_ms")
        ranges = {
            "q_factor": (min_q, max_q),
            "threshold_db": (min_threshold_db, max_threshold_db),
            "ratio": (min_ratio, max_ratio),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
        }
        self.param_ranges = {}
        for i in range(num_bands):
            for name in names:
                if name == "frequency_hz":
                    self.param_ranges[f"band{i}_{name}"] = (edges[i], edges[i + 1])
                else:
                    self.param_ranges[f"band{i}_{name}"] = ranges[name]

        def _process(x, sr, *args, **kw):
            static = {"knee_db": knee_db, "max_cut_db": max_cut_db,
                      "frame_size": frame_size, "hop": hop,
                      "smoother": smoother}
            if tv_power_fn is not None:
                static["tv_power_fn"] = tv_power_fn
            if tv_filter_fn is not None:
                static["tv_filter_fn"] = tv_filter_fn
            if args:  # raw positional passthrough
                return F.dynamic_eq(x, sr, *args, **{**static, **kw})
            stacked = {
                name: jnp.stack(
                    [kw.pop(f"band{i}_{name}") for i in range(num_bands)],
                    axis=-1,
                )
                for name in names
            }
            return F.dynamic_eq(x, sr, **stacked, **{**static, **kw})

        self.process_fn = _process


class StereoImager(Processor):
    """Multiband stereo width (functional.stereo_imager)."""

    def __init__(
        self,
        sample_rate: int,
        min_crossover_low_hz: float = 80.0,
        max_crossover_low_hz: float = 500.0,
        min_crossover_high_hz: float = 1000.0,
        max_crossover_high_hz: float = 8000.0,
        min_width: float = 0.0,
        max_width: float = 1.0,
        filter_method: str = "coupled",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.stereo_imager(
            x, *a, **{"filter_method": filter_method, **kw}
        )
        self.param_ranges = {
            "crossover_low_hz": (min_crossover_low_hz, max_crossover_low_hz),
            "crossover_high_hz": (min_crossover_high_hz, max_crossover_high_hz),
            "low_width": (min_width, max_width),
            "mid_width": (min_width, max_width),
            "high_width": (min_width, max_width),
        }


class WowFlutter(Processor):
    """Tape speed instability (functional.wow_flutter). Stochastic —
    pass ``key=`` (or ``noise=``) to process_normalized."""

    stochastic = True
    consumes_kwargs = ("noise",)

    def __init__(
        self,
        sample_rate: int,
        min_depth_ms: float = 0.0,
        max_depth_ms: float = 1.5,
        min_rate_hz: float = 0.1,
        max_wow_rate_hz: float = 2.0,
        max_flutter_rate_hz: float = 30.0,
        base_ms: float = 5.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.wow_flutter(
            x, *a, **{"base_ms": base_ms, **kw}
        )
        self.param_ranges = {
            "wow_depth_ms": (min_depth_ms, max_depth_ms),
            "flutter_depth_ms": (min_depth_ms, max_depth_ms),
            "wow_rate_hz": (min_rate_hz, max_wow_rate_hz),
            "flutter_rate_hz": (min_rate_hz, max_flutter_rate_hz),
        }


class RingModulator(Processor):
    """Sinusoidal carrier multiplication (functional.ring_modulator)."""

    def __init__(
        self,
        sample_rate: int,
        min_frequency_hz: float = 20.0,
        max_frequency_hz: float = 4000.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.ring_modulator
        self.param_ranges = {
            "frequency_hz": (min_frequency_hz, max_frequency_hz),
            "mix": (min_mix, max_mix),
        }


class Tremolo(Processor):
    """Sinusoidal amplitude modulation (functional.tremolo)."""

    def __init__(
        self,
        sample_rate: int,
        min_rate_hz: float = 0.1,
        max_rate_hz: float = 10.0,
        min_depth: float = 0.0,
        max_depth: float = 1.0,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = F.tremolo
        self.param_ranges = {
            "rate_hz": (min_rate_hz, max_rate_hz),
            "depth": (min_depth, max_depth),
        }


class Phaser(Processor):
    """LFO-swept allpass-cascade phaser (functional.phaser). ``stages``,
    ``frame_size`` and ``hop`` are static constructor settings."""

    def __init__(
        self,
        sample_rate: int,
        min_rate_hz: float = 0.05,
        max_rate_hz: float = 5.0,
        min_depth: float = 0.0,
        max_depth: float = 1.0,
        min_centre_frequency_hz: float = 200.0,
        max_centre_frequency_hz: float = 2000.0,
        min_feedback: float = -0.8,
        max_feedback: float = 0.8,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
        stages: int = 6,
        frame_size: int = 512,
        hop: int = 128,
        tv_filter_fn=None,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        defaults = {"stages": stages, "frame_size": frame_size, "hop": hop}
        if tv_filter_fn is not None:
            defaults["tv_filter_fn"] = tv_filter_fn
        self.process_fn = lambda x, *a, **kw: F.phaser(
            x, *a, **{**defaults, **kw},
        )
        self.param_ranges = {
            "rate_hz": (min_rate_hz, max_rate_hz),
            "depth": (min_depth, max_depth),
            "centre_frequency_hz": (min_centre_frequency_hz, max_centre_frequency_hz),
            "feedback": (min_feedback, max_feedback),
            "mix": (min_mix, max_mix),
        }


class AutoWah(Processor):
    """Envelope-following resonant bandpass (functional.auto_wah).
    ``frame_size`` and ``hop`` are static constructor settings."""

    def __init__(
        self,
        sample_rate: int,
        min_sensitivity: float = 0.5,
        max_sensitivity: float = 20.0,
        min_attack_ms: float = 1.0,
        max_attack_ms: float = 50.0,
        min_release_ms: float = 10.0,
        max_release_ms: float = 500.0,
        min_frequency_hz: float = 100.0,
        max_frequency_hz: float = 4000.0,
        min_q_factor: float = 0.707,
        max_q_factor: float = 10.0,
        min_mix: float = 0.0,
        max_mix: float = 1.0,
        frame_size: int = 512,
        hop: int = 128,
        tv_filter_fn=None,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        defaults = {"frame_size": frame_size, "hop": hop}
        if tv_filter_fn is not None:
            defaults["tv_filter_fn"] = tv_filter_fn
        self.process_fn = lambda x, *a, **kw: F.auto_wah(
            x, *a, **{**defaults, **kw}
        )
        # the sweep range is split into two learnable endpoints whose
        # normalized columns both span the full range; the functional
        # layer enforces f_max >= 1.01 * f_min
        self.param_ranges = {
            "sensitivity": (min_sensitivity, max_sensitivity),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "min_frequency_hz": (min_frequency_hz, max_frequency_hz),
            "max_frequency_hz": (min_frequency_hz, max_frequency_hz),
            "q_factor": (min_q_factor, max_q_factor),
            "mix": (min_mix, max_mix),
        }


class Limiter(Processor):
    """Feed-forward limiter: the compressor's ratio -> infinity corner
    (functional.limiter). Defaults to true attack/release ballistics."""

    def __init__(
        self,
        sample_rate: int,
        min_threshold_db: float = -24.0,
        max_threshold_db: float = 0.0,
        min_attack_ms: float = 0.1,
        max_attack_ms: float = 20.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 500.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        min_makeup_gain_db: float = 0.0,
        max_makeup_gain_db: float = 12.0,
        lookahead_samples: int = 0,
        smoother: str = "exact_pallas",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.limiter(
            x, *a,
            **{"smoother": smoother, "lookahead_samples": lookahead_samples, **kw},
        )
        self.param_ranges = {
            "threshold_db": (min_threshold_db, max_threshold_db),
            "attack_ms": (min_attack_ms, max_attack_ms),
            "release_ms": (min_release_ms, max_release_ms),
            "knee_db": (min_knee_db, max_knee_db),
            "makeup_gain_db": (min_makeup_gain_db, max_makeup_gain_db),
        }


class MultibandCompressor(Processor):
    """Three-band compressor over a Linkwitz-Riley LR4 crossover tree
    (functional.multiband_compressor)."""

    def __init__(
        self,
        sample_rate: int,
        min_crossover_low_hz: float = 60.0,
        max_crossover_low_hz: float = 1000.0,
        min_crossover_high_hz: float = 1000.0,
        max_crossover_high_hz: float = 12000.0,
        min_threshold_db: float = -60.0,
        max_threshold_db: float = 0.0,
        min_ratio: float = 1.0,
        max_ratio: float = 20.0,
        min_attack_ms: float = 5.0,
        max_attack_ms: float = 100.0,
        min_release_ms: float = 5.0,
        max_release_ms: float = 100.0,
        min_makeup_gain_db: float = 0.0,
        max_makeup_gain_db: float = 12.0,
        min_knee_db: float = 0.0,
        max_knee_db: float = 12.0,
        smoother: str = "block",
        filter_method: str = "coupled",
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.process_fn = lambda x, *a, **kw: F.multiband_compressor(
            x, *a,
            **{"smoother": smoother, "filter_method": filter_method, **kw},
        )
        ranges = {
            "crossover_low_hz": (min_crossover_low_hz, max_crossover_low_hz),
            "crossover_high_hz": (min_crossover_high_hz, max_crossover_high_hz),
        }
        for band in ("low", "mid", "high"):
            ranges[f"{band}_threshold_db"] = (min_threshold_db, max_threshold_db)
            ranges[f"{band}_ratio"] = (min_ratio, max_ratio)
            ranges[f"{band}_attack_ms"] = (min_attack_ms, max_attack_ms)
            ranges[f"{band}_release_ms"] = (min_release_ms, max_release_ms)
            ranges[f"{band}_makeup_gain_db"] = (min_makeup_gain_db, max_makeup_gain_db)
        ranges["knee_db"] = (min_knee_db, max_knee_db)
        self.param_ranges = ranges

"""L1 signal primitives: filter design, FSM filtering, FFT convolution,
exact IIR scans. TPU-native counterpart of the reference's
dasp_pytorch/signal.py."""

from .biquad import (
    biquad,
    one_pole_butter_highpass,
    one_pole_butter_lowpass,
    one_pole_filter,
)
from .fft_filter import (
    fft_freqz,
    fft_sosfreqz,
    freqdomain_fir,
    fsm_fft_size,
    lfilter_via_fsm,
    next_pow2,
    sosfilt_via_fsm,
)
from .filterbank import NUM_OCTAVE_BANDS, OCTAVE_BAND_CENTERS, octave_band_filterbank
from .fir import fft_conv_causal, fft_conv_full, fft_correlate_valid, ola_conv_causal
from .iir import (
    ballistics_smooth,
    lfilter1_exact,
    onepole_exact,
    onepole_varying,
    sosfilt_blockmat,
    sosfilt_exact,
)
from .pallas_ballistics import ballistics_pallas
from .tv_filter import tv_frame_centers, tv_frame_count, tv_freq_filter
from .pallas_iir import lfilter1_pallas, sosfilt_pallas

__all__ = [
    "tv_freq_filter",
    "tv_frame_count",
    "tv_frame_centers",
    "biquad",
    "one_pole_butter_highpass",
    "one_pole_butter_lowpass",
    "one_pole_filter",
    "fft_freqz",
    "fft_sosfreqz",
    "freqdomain_fir",
    "fsm_fft_size",
    "lfilter_via_fsm",
    "next_pow2",
    "sosfilt_via_fsm",
    "NUM_OCTAVE_BANDS",
    "OCTAVE_BAND_CENTERS",
    "octave_band_filterbank",
    "fft_conv_causal",
    "fft_conv_full",
    "fft_correlate_valid",
    "ola_conv_causal",
    "ballistics_smooth",
    "lfilter1_exact",
    "onepole_exact",
    "onepole_varying",
    "sosfilt_blockmat",
    "sosfilt_exact",
    "lfilter1_pallas",
    "sosfilt_pallas",
    "ballistics_pallas",
]

"""Native host-runtime (native/dasp_io.cpp via dasp_tpu.native) tests.

Parity of the C++ codec against scipy ground truth across sample
formats, range-read semantics, the thread-pool batch loader, the
streaming peak indexer, and the utils.audio fallback seams.
"""

import os
import struct

import numpy as np
import pytest

from dasp_tpu import native
from dasp_tpu.utils import audio as audio_utils

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ compiler available to build the native lib"
)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def _write_scipy(path, data, sr=22050):
    from scipy.io import wavfile

    wavfile.write(path, sr, data)


def _write_wav24(path, x, sr):
    """Hand-rolled 24-bit PCM writer (scipy cannot write 24-bit)."""
    frames, ch = x.shape
    ints = np.clip(np.round(x * 8388607.0), -8388608, 8388607).astype(np.int32)
    data = bytearray()
    for t in range(frames):
        for c in range(ch):
            data += struct.pack("<i", int(ints[t, c]) << 8)[1:4]
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr,
                                      sr * ch * 3, ch * 3, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + bytes(data))


@pytest.mark.parametrize("dtype,scale", [
    (np.int16, 32768.0),
    (np.int32, 2147483648.0),
    (np.float32, 1.0),
    (np.uint8, None),
])
def test_wav_read_matches_scipy_formats(tmp_path, rng, dtype, scale):
    x = (rng.standard_normal((5000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "f.wav")
    if dtype == np.uint8:
        raw = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
        expect = (raw.astype(np.float32) - 128.0) / 128.0
    elif dtype == np.float32:
        raw = x
        expect = x
    else:
        raw = np.clip(np.round(x.astype(np.float64) * scale), -scale, scale - 1).astype(dtype)
        expect = raw.astype(np.float32) / scale
    _write_scipy(p, raw)
    got, sr = native.wav_read(p)
    assert sr == 22050
    np.testing.assert_allclose(got, expect.T, atol=1e-6)


def test_wav_read_24bit(tmp_path, rng):
    x = (rng.standard_normal((3000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "f24.wav")
    _write_wav24(p, x, 48000)
    got, sr = native.wav_read(p)
    assert sr == 48000 and got.shape == (2, 3000)
    # what the 24-bit file actually stores (writer clips+rounds at 8388607)
    stored = np.clip(np.round(x * 8388607.0), -8388608, 8388607) / 8388608.0
    np.testing.assert_allclose(got, stored.T.astype(np.float32), atol=2e-7)


def test_wav_read_float64(tmp_path, rng):
    x = rng.standard_normal((2000, 1)) * 0.5
    p = str(tmp_path / "f64.wav")
    _write_scipy(p, x)  # scipy writes float64 as IEEE double
    got, _ = native.wav_read(p)
    np.testing.assert_allclose(got, x.T.astype(np.float32), atol=1e-7)


def test_range_read_and_eof_zero_fill(tmp_path, rng):
    x = (rng.standard_normal((4000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "r.wav")
    _write_scipy(p, x)
    full, _ = native.wav_read(p)
    part, _ = native.wav_read(p, offset=500, frames=1000)
    np.testing.assert_array_equal(part, full[:, 500:1500])
    # clip running past EOF: valid head, zero tail
    tail, _ = native.wav_read(p, offset=3500, frames=1000)
    np.testing.assert_array_equal(tail[:, :500], full[:, 3500:])
    assert np.all(tail[:, 500:] == 0.0)
    # offset entirely past EOF: all zeros
    beyond, _ = native.wav_read(p, offset=5000, frames=100)
    assert np.all(beyond == 0.0)


def test_wav_info(tmp_path, rng):
    x = (rng.standard_normal((1000, 3)) * 0.2).astype(np.float32)
    p = str(tmp_path / "i.wav")
    _write_scipy(p, x, sr=8000)
    sr, ch, nf, bits, is_float = native.wav_info(p)
    assert (sr, ch, nf, bits, is_float) == (8000, 3, 1000, 32, True)


def test_write_read_roundtrip_quantization(tmp_path, rng):
    x = (rng.standard_normal((2, 8000)) * 0.7).astype(np.float32)
    p = str(tmp_path / "w.wav")
    native.wav_write(p, x, 44100)
    y, sr = native.wav_read(p)
    assert sr == 44100
    # write scales by 32767 (truncating like the Python fallback), read
    # divides by 32768: bound = scale mismatch + one truncation step
    assert np.abs(y - np.clip(x, -1, 1)).max() <= 2.5 / 32768.0
    # scipy reads our header fine too
    from scipy.io import wavfile
    sr2, raw = wavfile.read(p)
    assert sr2 == 44100 and raw.dtype == np.int16 and raw.shape == (8000, 2)


def test_chunk_peaks_matches_python(tmp_path, rng):
    x = (rng.standard_normal((10240, 2)) * 0.3).astype(np.float32)
    x[2048:3072] = 0.0  # a silent chunk
    p = str(tmp_path / "pk.wav")
    _write_scipy(p, x)
    peaks = native.chunk_peaks(p, 1024)
    ref = np.array([np.abs(x.T[:, i * 1024:(i + 1) * 1024]).max() for i in range(10)])
    np.testing.assert_allclose(peaks, ref, atol=1e-7)
    assert peaks[2] == 0.0


def test_load_batch_matches_sequential(tmp_path, rng):
    paths = []
    for k in range(3):
        x = (rng.standard_normal((6000, 2)) * 0.4).astype(np.float32)
        p = str(tmp_path / f"b{k}.wav")
        _write_scipy(p, x)
        paths.append(p)
    examples = [(paths[0], 0), (paths[1], 1000), (paths[2], 5500), (paths[0], 2000)]
    batch = native.load_batch(examples, 1024, channels=1, mono_mix=True, num_threads=4)
    assert batch.shape == (4, 1, 1024)
    for i, (p, off) in enumerate(examples):
        full, _ = native.wav_read(p)
        want = np.zeros((1024,), np.float32)
        seg = full[:, off:off + 1024].mean(axis=0)
        want[: seg.shape[-1]] = seg
        np.testing.assert_allclose(batch[i, 0], want, atol=1e-6)


def test_load_batch_multichannel_no_mix(tmp_path, rng):
    x = (rng.standard_normal((4096, 2)) * 0.4).astype(np.float32)
    p = str(tmp_path / "mc.wav")
    _write_scipy(p, x)
    batch = native.load_batch([(p, 100)], 512, channels=2, mono_mix=False)
    full, _ = native.wav_read(p)
    np.testing.assert_array_equal(batch[0], full[:, 100:612])


def test_load_clip_batch_pad_mode_repeat(tmp_path, rng, monkeypatch):
    """Mono source + stereo request: 'repeat' cycles channels, 'zero' pads,
    and the native path agrees with the python fallback for both."""
    x = (rng.standard_normal((4096, 1)) * 0.4).astype(np.float32)
    p = str(tmp_path / "mono.wav")
    _write_scipy(p, x)
    examples = [(p, 0), (p, 1000)]

    rep_n = audio_utils.load_clip_batch(examples, 512, channels=2,
                                        mono_mix=False, pad_mode="repeat")
    zero_n = audio_utils.load_clip_batch(examples, 512, channels=2,
                                         mono_mix=False, pad_mode="zero")
    np.testing.assert_array_equal(rep_n[:, 1], rep_n[:, 0])
    assert np.all(zero_n[:, 1] == 0.0) and np.any(zero_n[:, 0] != 0.0)

    monkeypatch.setattr(native, "available", lambda: False)
    rep_p = audio_utils.load_clip_batch(examples, 512, channels=2,
                                        mono_mix=False, pad_mode="repeat")
    np.testing.assert_allclose(rep_n, rep_p, atol=1e-6)
    with pytest.raises(ValueError, match="pad_mode"):
        audio_utils.load_clip_batch(examples, 512, pad_mode="wrap")


def test_truncated_file_clamps_frames(tmp_path, rng):
    """A header that claims more data than the file holds must clamp to
    the decodable frames (truncated downloads are common), with range
    reads past the real tail zero-filled — not an IO error."""
    x = (rng.standard_normal((4000, 2)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    _write_scipy(p, x)
    size = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(size - 1000 * 2 * 4)  # cut the last 1000 stereo float32 frames
    sr, ch, nf, _, _ = native.wav_info(p)
    assert nf == 3000
    got, _ = native.wav_read(p, offset=2500, frames=1000)
    np.testing.assert_allclose(got[:, :500], x.T[:, 2500:3000], atol=1e-7)
    assert np.all(got[:, 500:] == 0.0)


def test_odd_sized_fmt_chunk(tmp_path):
    """RIFF chunks are word-aligned: an odd-size fmt chunk carries a pad
    byte the parser must skip to stay in sync."""
    sr, ch = 8000, 1
    frames = 100
    data = struct.pack("<%dh" % frames, *range(frames))
    fmt_body = struct.pack("<HHIIHH", 1, ch, sr, sr * 2, 2, 16) + b"\x00"  # 17 bytes
    body = (b"fmt " + struct.pack("<I", 17) + fmt_body + b"\x00"  # pad byte
            + b"data" + struct.pack("<I", len(data)) + data)
    p = str(tmp_path / "odd.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    got_sr, got_ch, nf, bits, isf = native.wav_info(p)
    assert (got_sr, got_ch, nf, bits, isf) == (sr, ch, frames, 16, False)
    got, _ = native.wav_read(p)
    np.testing.assert_allclose(got[0], np.arange(frames) / 32768.0, atol=1e-7)


def test_error_codes(tmp_path):
    with pytest.raises(RuntimeError, match="cannot open"):
        native.wav_info(str(tmp_path / "missing.wav"))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a riff file at all........")
    with pytest.raises(RuntimeError, match="RIFF"):
        native.wav_info(str(bad))


def test_utils_audio_uses_native_and_fallback_agrees(tmp_path, rng, monkeypatch):
    x = (rng.standard_normal((8192, 2)) * 0.4).astype(np.float32)
    p = str(tmp_path / "ds" / "a.wav")
    os.makedirs(os.path.dirname(p))
    _write_scipy(p, x, sr=44100)

    idx_native = audio_utils.index_wav_dataset(str(tmp_path / "ds"), 1024)
    clip_native = audio_utils.load_clip(idx_native[3], 1024)
    batch_native = audio_utils.load_clip_batch(idx_native[:2], 1024)
    wav_native, sr_native = audio_utils.load_wav(p)

    monkeypatch.setattr(native, "available", lambda: False)
    idx_py = audio_utils.index_wav_dataset(str(tmp_path / "ds"), 1024)
    clip_py = audio_utils.load_clip(idx_py[3], 1024)
    batch_py = audio_utils.load_clip_batch(idx_py[:2], 1024)
    wav_py, sr_py = audio_utils.load_wav(p)

    assert idx_native == idx_py and sr_native == sr_py
    np.testing.assert_allclose(wav_native, wav_py, atol=1e-6)
    np.testing.assert_allclose(clip_native, clip_py, atol=1e-6)
    np.testing.assert_allclose(batch_native, batch_py, atol=1e-6)


def test_save_wav_native_matches_python(tmp_path, rng, monkeypatch):
    x = (rng.standard_normal((1, 4000)) * 1.2).astype(np.float32)  # clips
    pn = str(tmp_path / "n.wav")
    pp = str(tmp_path / "p.wav")
    audio_utils.save_wav(pn, x, 16000)
    monkeypatch.setattr(native, "available", lambda: False)
    audio_utils.save_wav(pp, x, 16000)
    from scipy.io import wavfile
    _, a = wavfile.read(pn)
    _, b = wavfile.read(pp)
    np.testing.assert_array_equal(a, b)

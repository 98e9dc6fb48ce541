"""Mel front-end numerics and audio IO tests."""

import numpy as np
import pytest

from mapperatorinator_tpu.audio import MelSpectrogram, load_audio_file
from mapperatorinator_tpu.audio.mel import _dft_matrices, hann_window_periodic, mel_filterbank


def _numpy_reference_mel(samples, sr, n_fft, hop, n_mels, f_min, f_max, pad_mode, log_scale):
    """Independent numpy implementation of torchaudio MelSpectrogram semantics."""
    window = hann_window_periodic(n_fft)
    pad = n_fft // 2
    mode = "reflect" if pad_mode == "reflect" else "constant"
    padded = np.pad(samples, ((0, 0), (pad, pad)), mode=mode)
    n_frames = samples.shape[1] // hop + 1
    frames = np.stack([padded[:, i * hop : i * hop + n_fft] for i in range(n_frames)], axis=1)
    spec = np.fft.rfft(frames * window)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sr)
    mel = power @ fb
    if log_scale:
        mel = np.log1p(mel)
    return mel.astype(np.float32)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2) / 16000
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t))
    return x.astype(np.float32)[None, :]


@pytest.mark.parametrize("pad_mode,log_scale", [("constant", False), ("reflect", True)])
def test_mel_xla_matches_numpy(audio, pad_mode, log_scale):
    kw = dict(sample_rate=16000, n_fft=1024, hop_length=128, n_mels=128, f_min=20, f_max=8000)
    mel = MelSpectrogram(implementation="xla", log_scale=log_scale, pad_mode=pad_mode, **kw)
    got = np.asarray(mel(audio))
    want = _numpy_reference_mel(audio, 16000, 1024, 128, 128, 20, 8000, pad_mode, log_scale)
    assert got.shape == (1, 2 * 16000 // 128 + 1, 128)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mel_v32_shape(audio):
    # v32 config: log_scale, n_mels=128, reflect padding
    mel = MelSpectrogram(
        implementation="torchaudio", log_scale=True, sample_rate=16000,
        n_fft=1024, n_mels=128, hop_length=128, f_min=20, f_max=8000, pad_mode="reflect",
    )
    window = np.zeros((1, 128 * 2047), np.float32)
    window[:, : audio.shape[1]] = audio
    out = mel(window)
    assert out.shape == (1, 2048, 128)
    assert out.dtype == np.float32


def test_mel_pallas_matches_xla(audio):
    """The fused GEMM-native kernel agrees with the rfft path (interpret mode
    on CPU; the same kernel compiles for TPU)."""
    short = audio[:, : 128 * 63]  # 64 frames
    kw = dict(sample_rate=16000, n_fft=1024, hop_length=128, n_mels=128, f_min=20, f_max=8000,
              pad_mode="reflect", log_scale=True)
    ref = np.asarray(MelSpectrogram(implementation="xla", **kw)(short))

    from mapperatorinator_tpu.audio.mel import MelSpectrogram as MS
    from mapperatorinator_tpu.ops.mel_kernel import fused_mel
    import jax.numpy as jnp

    m = MS(implementation="xla", **kw)
    pad = 512
    padded = np.pad(short, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = short.shape[1] // 128 + 1
    frames = np.stack([padded[:, i * 128 : i * 128 + 1024] for i in range(n_frames)], axis=1)
    w_re, w_im = _dft_matrices(1024, m.window)
    got = np.asarray(
        fused_mel(jnp.asarray(frames), jnp.asarray(w_re), jnp.asarray(w_im),
                  jnp.asarray(m.fbanks), True, tile_frames=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_load_wav(tmp_path):
    import wave

    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 220 * t) * 0.5 * 32767).astype("<i2")
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())

    samples = load_audio_file(p, sr)
    assert len(samples) == sr
    assert abs(float(np.max(samples)) - 0.5) < 0.01

    # normalization scales the peak to 1
    normed = load_audio_file(p, sr, normalize=True)
    assert float(np.max(np.abs(normed))) == pytest.approx(1.0, abs=1e-4)

    # speed 2.0 halves the length
    fast = load_audio_file(p, sr, speed=2.0)
    assert abs(len(fast) - sr // 2) < 10

    # resampling to another rate
    res = load_audio_file(p, 8000)
    assert abs(len(res) - 8000) < 10

import jax.numpy as jnp
import numpy as np
import pytest

from early_exit_tpu.configs import AudioConfig
from early_exit_tpu.ops import frontend

torch = pytest.importorskip("torch")


def test_spectrogram_matches_torch_stft():
    """Oracle: torch.stft with torchaudio-Spectrogram-equivalent settings
    (center=True, reflect pad, periodic Hann, power=2)."""
    rng = np.random.RandomState(0)
    N = 16000
    wav = rng.randn(2, N).astype(np.float32) * 0.1
    n_fft, win, hop = 1024, 320, 160

    ours = frontend.spectrogram(jnp.asarray(wav), n_fft=n_fft,
                                win_length=win, hop_length=hop)

    wt = torch.tensor(wav)
    window = torch.hann_window(win)
    st = torch.stft(wt, n_fft=n_fft, hop_length=hop, win_length=win,
                    window=window, center=True, pad_mode="reflect",
                    return_complex=True)
    ref = (st.abs() ** 2).numpy()                 # (B, F, T)
    ref = np.transpose(ref, (0, 2, 1))            # (B, T, F)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("n_fft,win", [
    (1024, 320),    # reference config: window-support crop drops 69%
    (512, 400),     # odd offset (left = 56)
    (256, 256),     # window == frame (no crop)
    (1024, 1),      # degenerate single-sample window
])
def test_dft_path_matches_fft_path(n_fft, win):
    """The MXU DFT-matmul spectrogram (frames and basis cropped to the
    Hann window's support) equals the XLA FFT one at every window/FFT
    geometry, including odd crop offsets."""
    rng = np.random.RandomState(3)
    wav = jnp.asarray((0.1 * rng.randn(2, 4000)).astype(np.float32))
    a = frontend.spectrogram(wav, n_fft=n_fft, win_length=win,
                             hop_length=160, method="dft")
    b = frontend.spectrogram(wav, n_fft=n_fft, win_length=win,
                             hop_length=160, method="fft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                               rtol=1e-3)


def test_mel_filterbank_properties():
    fb = np.asarray(frontend.mel_filterbank(513, 80, 16000))
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # each filter peaks at 1 (un-normalised triangles) except possibly
    # edge effects from discretisation
    peaks = fb.max(axis=0)
    assert (peaks > 0.5).all()
    # filter centre frequencies are increasing
    centres = fb.argmax(axis=0)
    assert (np.diff(centres) >= 0).all()
    # low filters are narrow, high filters wide (HTK mel spacing)
    widths = (fb > 0).sum(axis=0)
    assert widths[-1] > widths[0]


def test_mel_filterbank_matches_htk_formula():
    """Independent numpy oracle for a tiny filterbank."""
    n_freqs, n_mels, sr = 9, 3, 16
    fb = np.asarray(frontend.mel_filterbank(n_freqs, n_mels, sr))
    freqs = np.linspace(0, sr / 2, n_freqs)
    m = lambda f: 2595.0 * np.log10(1 + f / 700.0)
    minv = lambda x: 700.0 * (10 ** (x / 2595.0) - 1)
    pts = minv(np.linspace(m(0), m(sr / 2), n_mels + 2))
    expect = np.zeros((n_freqs, n_mels))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        for j, f in enumerate(freqs):
            if lo <= f <= c and c > lo:
                expect[j, i] = (f - lo) / (c - lo)
            elif c < f <= hi and hi > c:
                expect[j, i] = (hi - f) / (hi - c)
    np.testing.assert_allclose(fb, expect, atol=1e-6)


def test_mel_spectrogram_shapes_and_lengths():
    cfg = AudioConfig()
    wav = jnp.zeros((3, 16000))
    mel = frontend.mel_spectrogram(wav, cfg)
    assert mel.shape == (3, 1 + 16000 // 160, 80)
    lens = frontend.mel_lengths(jnp.asarray([16000, 8000, 160]), 160)
    np.testing.assert_array_equal(np.asarray(lens), [101, 51, 2])


def test_jit_and_finite():
    import jax
    cfg = AudioConfig()
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32))
    fn = jax.jit(lambda w: frontend.mel_spectrogram(w, cfg))
    mel = fn(wav)
    assert np.isfinite(np.asarray(mel)).all()
    assert (np.asarray(mel) >= 0).all()

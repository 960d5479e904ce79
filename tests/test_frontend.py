"""Frontend parity tests (SURVEY.md §4: golden MFCC vectors, tol ~1e-4).

librosa is not in the image, so parity is pinned in two stages:
  1. the numpy oracle's building blocks are verified against scipy/np.fft
     (the same libraries librosa calls into), and
  2. the fused XLA/Pallas kernels are verified against the oracle.
"""

import numpy as np
import pytest
import scipy.fftpack
import scipy.signal

from asr_using_robust_nn_tpu.ops import filters, frontend_ref
from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig, mfcc_xla_batch

DIGIT = FrontendConfig.digit()
SPEAKER = FrontendConfig.speaker()


class TestFilters:
    def test_hann_matches_scipy_periodic(self):
        for n in (441, 2048):
            ours = filters.hann_window(n)
            theirs = scipy.signal.get_window("hann", n, fftbins=True)
            np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_dct_matches_scipy_ortho(self, rng):
        x = rng.standard_normal((128, 7))
        full = scipy.fftpack.dct(x, axis=0, type=2, norm="ortho")
        ours = filters.dct_matrix(20, 128) @ x
        np.testing.assert_allclose(ours, full[:20], atol=1e-10)

    def test_rdft_matches_rfft(self, rng):
        for n_fft, win in ((2048, 2048), (441, 441)):
            frame = rng.standard_normal(n_fft)
            cr, ci = filters.rdft_matrices(n_fft, win)
            w = filters.pad_center(filters.hann_window(win), n_fft)
            spec = np.fft.rfft(frame * w)
            np.testing.assert_allclose(frame @ cr, spec.real, atol=1e-8)
            np.testing.assert_allclose(frame @ ci, spec.imag, atol=1e-8)

    def test_mel_filterbank_shape_and_properties(self):
        mel = filters.mel_filterbank(22050, 2048, 128)
        assert mel.shape == (128, 1025)
        assert (mel >= 0).all()
        # every filter is a normalized triangle: single contiguous support
        assert (mel.sum(axis=1) > 0).all()
        # slaney norm: peak of filter i ~= 2/(width in Hz); spot-check monotone
        # center frequencies
        centers = mel.argmax(axis=1)
        assert (np.diff(centers) >= 0).all()

    def test_mel_golden_values(self):
        # Slaney anchors derived by hand: mel(11025 Hz) = 15 + 27*ln(11.025)/
        # ln(6.4) ≈ 49.912 mel; 130 points → spacing ≈ 0.38692 mel; below
        # 1 kHz one mel = 200/3 Hz, so the first triangle peaks at
        # ≈ 25.79 Hz and its peak weight is 2/(width of 2 spacings in Hz).
        mel = filters.mel_filterbank(22050, 2048, 128)
        max_mel = 15.0 + 27.0 * np.log(11025.0 / 1000.0) / np.log(6.4)
        spacing_hz = max_mel / 129.0 * (200.0 / 3)
        fftfreqs = np.linspace(0, 22050 / 2, 1025)
        peak_bin = np.argmin(np.abs(fftfreqs - spacing_hz))
        assert mel[0].argmax() == peak_bin
        peak_val = mel[0].max()
        # triangle peak height at the grid point nearest the true peak
        want = (2.0 / (2 * spacing_hz)) * (
            1 - abs(fftfreqs[peak_bin] - spacing_hz) / spacing_hz
        )
        np.testing.assert_allclose(peak_val, want, rtol=1e-6)

    def test_num_frames(self):
        # 1 s @ 22.05 kHz -> 44 frames (digit), 101 frames (speaker):
        # the comment at extract_features_construct_dataset.py:17.
        assert frontend_ref.num_frames(22050, 512) == 44
        # speaker preset: pass its ODD n_fft=441 explicitly — the odd
        # branch differs from the 2048 default whenever n % hop == 0
        assert frontend_ref.num_frames(22050, 220, 441) == 101


class TestOracle:
    def test_stft_matches_scipy(self, rng):
        y = rng.standard_normal(5000)
        ours = frontend_ref.stft_power_ref(y, 512, 128, 512)
        f, t, z = scipy.signal.stft(
            y,
            nperseg=512,
            noverlap=512 - 128,
            window=scipy.signal.get_window("hann", 512, fftbins=True),
            boundary="zeros",
            padded=True,
            return_onesided=True,
        )
        # scipy scales by win.sum(); undo and compare the overlapping frames
        scale = scipy.signal.get_window("hann", 512, fftbins=True).sum()
        theirs = np.abs(z * scale) ** 2
        n = min(ours.shape[1], theirs.shape[1])
        np.testing.assert_allclose(ours[:, :n], theirs[:, :n], atol=1e-6)

    def test_power_to_db_top_db_floor(self):
        s = np.array([[1.0, 1e-12]])
        db = frontend_ref.power_to_db_ref(s)
        assert db[0, 0] == 0.0
        assert db[0, 1] == -80.0  # clipped at max - top_db

    def test_fixed_length_pad_and_truncate(self, rng):
        y = rng.standard_normal(22050).astype(np.float32)
        m = frontend_ref.mfcc_fixed_length_ref(y, 44)
        assert m.shape == (20, 44)
        short = rng.standard_normal(11025).astype(np.float32)
        m2 = frontend_ref.mfcc_fixed_length_ref(short, 44)
        assert m2.shape == (20, 44)
        n_true = frontend_ref.num_frames(11025, 512)
        assert np.all(m2[:, n_true:] == 0)


class TestXLAvsOracle:
    @pytest.mark.parametrize("cfg", [DIGIT, SPEAKER], ids=["digit", "speaker"])
    def test_batch_matches_oracle(self, cfg, rng):
        b, n = 4, 22050
        waves = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
        got = np.asarray(mfcc_xla_batch(waves, cfg))
        assert got.shape == (b, cfg.n_mfcc, cfg.utterance_length)
        for i in range(b):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i],
                cfg.utterance_length,
                sr=cfg.sr,
                n_fft=cfg.n_fft,
                hop_length=cfg.hop_length,
                win_length=cfg.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=2e-3, rtol=1e-4)

    def test_short_utterance_masking(self, rng):
        cfg = DIGIT
        true_len = 11025
        waves = np.zeros((2, 22050), dtype=np.float32)
        waves[:, :true_len] = rng.standard_normal((2, true_len)) * 0.1
        lengths = np.array([true_len, 22050])
        got = np.asarray(mfcc_xla_batch(waves, cfg, lengths=lengths))
        want0 = frontend_ref.mfcc_fixed_length_ref(waves[0, :true_len], 44)
        np.testing.assert_allclose(got[0], want0, atol=2e-3, rtol=1e-4)
        n_true = frontend_ref.num_frames(true_len, 512)
        assert np.all(got[0][:, n_true:] == 0)

    def test_silent_input(self):
        # all-zero audio: mel power == amin everywhere, db == -100, DCT of a
        # constant vector — must not NaN.
        waves = np.zeros((1, 22050), dtype=np.float32)
        got = np.asarray(mfcc_xla_batch(waves, DIGIT))
        assert np.isfinite(got).all()
        want = frontend_ref.mfcc_fixed_length_ref(np.zeros(22050), 44)
        np.testing.assert_allclose(got[0], want, atol=2e-3)


class TestDftSplitLevels:
    @pytest.mark.parametrize("levels", [1, 2, 3])
    def test_split_radix_matches_direct(self, levels, rng):
        import dataclasses

        cfg = dataclasses.replace(DIGIT, dft_split_levels=levels)
        waves = (rng.standard_normal((3, 22050)) * 0.1).astype(np.float32)
        got = np.asarray(mfcc_xla_batch(waves, cfg))
        want = np.asarray(mfcc_xla_batch(waves, DIGIT))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestFftVariant:
    def test_fft_matches_oracle(self, rng):
        from asr_using_robust_nn_tpu.ops.mfcc_xla import mfcc_fft_batch

        waves = (rng.standard_normal((3, 22050)) * 0.1).astype(np.float32)
        got = np.asarray(mfcc_fft_batch(waves, DIGIT))
        for i in range(3):
            want = frontend_ref.mfcc_fixed_length_ref(waves[i], 44)
            np.testing.assert_allclose(got[i], want, atol=2e-3, rtol=1e-4)


class TestInt8Variant:
    """ops/mfcc_int8.py: six-int8-matmul rDFT (digit decomposition)."""

    @pytest.mark.parametrize("cfg", [DIGIT, SPEAKER], ids=["digit", "speaker"])
    def test_matches_oracle_with_amplitude_spread(self, cfg, rng):
        from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch

        # amplitudes spanning 50x: exercises the per-row block scaling
        amps = np.array([0.02, 0.2, 1.0, 0.5])[:, None]
        waves = (rng.standard_normal((4, 22050)) * amps).astype(np.float32)
        got = np.asarray(mfcc_int8_batch(waves, cfg))
        for i in range(4):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], cfg.utterance_length, sr=cfg.sr, n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, win_length=cfg.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)

    def test_digit_reconstruction_exact_for_int16_audio(self, rng):
        """int16-origin audio (the WAV decode path) is represented EXACTLY
        by the three base-128 digits after block scaling."""
        from asr_using_robust_nn_tpu.ops.mfcc_int8 import (
            _X_SCALES, _wave_digits)

        k = rng.integers(-32768, 32768, (3, 1000)).astype(np.float32)
        y = k / 32768.0
        digits, f = _wave_digits(y)
        rec = sum(
            np.asarray(d).astype(np.float64) * s
            for d, s in zip(digits, _X_SCALES)
        ) / np.asarray(f)[:, None]
        np.testing.assert_allclose(rec, y.astype(np.float64), atol=0)

    def test_lengths_masking_matches_xla(self, rng):
        from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch

        waves = (rng.standard_normal((3, 22050)) * 0.1).astype(np.float32)
        lengths = np.array([22050, 11025, 700])
        for i, L in enumerate(lengths):
            waves[i, L:] = 0
        a = np.asarray(mfcc_int8_batch(waves, DIGIT, lengths=lengths))
        b = np.asarray(mfcc_xla_batch(waves, DIGIT, lengths=lengths))
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_silent_input(self):
        from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch

        got = np.asarray(mfcc_int8_batch(np.zeros((1, 22050), np.float32),
                                         DIGIT))
        assert np.isfinite(got).all()
        want = frontend_ref.mfcc_fixed_length_ref(np.zeros(22050), 44)
        np.testing.assert_allclose(got[0], want, atol=2e-3)


class TestHopDftVariant:
    """ops/mfcc_hopdft.py: hop-block rDFT exploiting the digit preset's
    75% frame overlap (4x fewer DFT matmul FLOPs, no framing expansion)."""

    def test_supported_presets(self):
        import dataclasses

        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            hopdft_int8_supported, hopdft_supported)

        assert hopdft_supported(DIGIT)          # 2048 % 512 == 0
        # round-3 generalization: the speaker preset (441 = 2*220 + 1) is
        # covered via the s=1 tail matmul + odd-n_fft Hermitian edge...
        assert hopdft_supported(SPEAKER)
        # ...by the f32 variant only (the exact-int32 combine has no
        # tail path and 441/220 has no integer roots)
        assert not hopdft_int8_supported(SPEAKER)
        # the frequency-domain Hann still requires a full-frame window
        assert not hopdft_supported(
            dataclasses.replace(DIGIT, win_length=1024))
        # and hop <= n_fft (frames would skip samples otherwise)
        assert not hopdft_supported(
            dataclasses.replace(DIGIT, hop_length=4096))

    @pytest.mark.parametrize("variant", ["f32", "int8"])
    def test_matches_oracle_with_amplitude_spread(self, variant, rng):
        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            mfcc_hopdft_batch, mfcc_hopdft_int8_batch)

        fn = mfcc_hopdft_batch if variant == "f32" else mfcc_hopdft_int8_batch
        amps = np.array([0.02, 0.2, 1.0, 0.5])[:, None]
        waves = (rng.standard_normal((4, 22050)) * amps).astype(np.float32)
        got = np.asarray(fn(waves, DIGIT))
        for i in range(4):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], DIGIT.utterance_length, sr=DIGIT.sr,
                n_fft=DIGIT.n_fft, hop_length=DIGIT.hop_length,
                win_length=DIGIT.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)

    def test_honors_dft_algorithm(self, rng):
        """The block matmul obeys cfg.dft_algorithm like the direct path:
        bf16_x6 emulation keeps full parity with fewer MXU passes."""
        import dataclasses

        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import mfcc_hopdft_batch

        cfg = dataclasses.replace(DIGIT, dft_algorithm="bf16_x6")
        waves = (rng.standard_normal((2, 22050)) * 0.3).astype(np.float32)
        got = np.asarray(mfcc_hopdft_batch(waves, cfg))
        for i in range(2):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], cfg.utterance_length, sr=cfg.sr, n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, win_length=cfg.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)
        # discriminate that the override is actually APPLIED (parity alone
        # can't tell — ignoring it makes parity BETTER, and the CPU backend
        # computes X6 bit-identically to highest): the lowered IR must
        # carry the 6-primitive bf16 DotAlgorithm on the block DFT
        import jax

        txt = jax.jit(lambda w: mfcc_hopdft_batch(w, cfg)).lower(
            waves[:1]).as_text()
        assert ("precision_type = bf16" in txt
                and "num_primitive_operations = 6" in txt), "X6 not applied"
        txt0 = jax.jit(lambda w: mfcc_hopdft_batch(w, DIGIT)).lower(
            waves[:1]).as_text()
        assert "num_primitive_operations" not in txt0

    def test_lengths_masking_matches_xla(self, rng):
        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            mfcc_hopdft_batch, mfcc_hopdft_int8_batch)

        waves = (rng.standard_normal((3, 22050)) * 0.1).astype(np.float32)
        lengths = np.array([22050, 11025, 700])
        for i, L in enumerate(lengths):
            waves[i, L:] = 0
        want = np.asarray(mfcc_xla_batch(waves, DIGIT, lengths=lengths))
        for fn in (mfcc_hopdft_batch, mfcc_hopdft_int8_batch):
            got = np.asarray(fn(waves, DIGIT, lengths=lengths))
            np.testing.assert_allclose(got, want, atol=1e-3)
            # break the shared-_finish_mfcc echo: one truncated row checked
            # against the INDEPENDENT f64 oracle on the unpadded signal
            ref = frontend_ref.mfcc_fixed_length_ref(
                waves[1, :11025].astype(np.float64), DIGIT.utterance_length)
            np.testing.assert_allclose(got[1], ref, atol=1e-3)

    def test_silent_input(self):
        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            mfcc_hopdft_batch, mfcc_hopdft_int8_batch)

        want = frontend_ref.mfcc_fixed_length_ref(np.zeros(22050), 44)
        for fn in (mfcc_hopdft_batch, mfcc_hopdft_int8_batch):
            got = np.asarray(fn(np.zeros((1, 22050), np.float32), DIGIT))
            assert np.isfinite(got).all()
            np.testing.assert_allclose(got[0], want, atol=2e-3)

    def test_other_overlap_ratios(self, rng):
        """r = n_fft/hop generality: r=2 works in both variants; r=3 has
        non-integer unit roots, so the f32 combine handles it and the int8
        variant refuses rather than silently truncating the cos/sin
        coefficients on its exact-int32 combine."""
        import dataclasses

        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            hopdft_supported, mfcc_hopdft_batch, mfcc_hopdft_int8_batch)

        waves = (rng.standard_normal((2, 22050)) * 0.3).astype(np.float32)

        r2 = dataclasses.replace(DIGIT, hop_length=1024, utterance_length=22)
        assert hopdft_supported(r2)
        for fn in (mfcc_hopdft_batch, mfcc_hopdft_int8_batch):
            got = np.asarray(fn(waves, r2))
            for i in range(2):
                want = frontend_ref.mfcc_fixed_length_ref(
                    waves[i], r2.utterance_length, sr=r2.sr, n_fft=r2.n_fft,
                    hop_length=r2.hop_length, win_length=r2.win_length,
                )
                np.testing.assert_allclose(got[i], want, atol=1e-3,
                                           rtol=1e-4)

        r3 = dataclasses.replace(DIGIT, n_fft=2046, hop_length=682,
                                 win_length=2046, utterance_length=33)
        assert hopdft_supported(r3)
        got = np.asarray(mfcc_hopdft_batch(waves, r3))
        for i in range(2):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], r3.utterance_length, sr=r3.sr, n_fft=r3.n_fft,
                hop_length=r3.hop_length, win_length=r3.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)
        with pytest.raises(ValueError, match="1,2,4"):
            mfcc_hopdft_int8_batch(waves, r3)
        # and eagerly at dispatcher construction (python -O safe)
        from asr_using_robust_nn_tpu.frontend.mfcc import Frontend
        with pytest.raises(ValueError, match="1,2,4"):
            Frontend(r3, backend="hopdft_int8")
        Frontend(r3, backend="hopdft")  # f32 variant accepts r=3

        # odd n_fft (no Nyquist bin): the parity-aware Hermitian edge
        # handles it — r=3 dividing hop at n_fft=441
        odd = dataclasses.replace(DIGIT, n_fft=441, hop_length=147,
                                  win_length=441, utterance_length=151)
        assert hopdft_supported(odd)
        got = np.asarray(mfcc_hopdft_batch(waves, odd))
        for i in range(2):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], odd.utterance_length, sr=odd.sr, n_fft=odd.n_fft,
                hop_length=odd.hop_length, win_length=odd.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)

    def test_non_dividing_hop_tail_matmul(self, rng):
        """n_fft = q*hop + s with s > 0: the tail matmul covers the s
        samples of block f+q. Both parities of n_fft, oracle-checked."""
        import dataclasses

        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            hopdft_supported, mfcc_hopdft_batch)

        waves = (rng.standard_normal((2, 22050)) * 0.3).astype(np.float32)
        cases = [
            SPEAKER,                                  # 441 = 2*220 + 1, odd
            dataclasses.replace(DIGIT, n_fft=500, hop_length=300,
                                win_length=500, utterance_length=40),
            # s = hop - 1 (maximal tail) at odd n_fft
            dataclasses.replace(DIGIT, n_fft=599, hop_length=200,
                                win_length=599, utterance_length=80),
        ]
        for cfg in cases:
            assert hopdft_supported(cfg)
            got = np.asarray(mfcc_hopdft_batch(waves, cfg))
            for i in range(2):
                want = frontend_ref.mfcc_fixed_length_ref(
                    waves[i], cfg.utterance_length, sr=cfg.sr,
                    n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                    win_length=cfg.win_length,
                )
                np.testing.assert_allclose(got[i], want, atol=1e-3,
                                           rtol=1e-4)

    def test_speaker_lengths_masking(self, rng):
        """Masked short rows through the speaker hop-block path match the
        per-file f64 oracle on the unpadded signal (the guarantee the
        data pipeline relies on for variable-length batches)."""
        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import mfcc_hopdft_batch

        waves = (rng.standard_normal((3, 22050)) * 0.1).astype(np.float32)
        lengths = np.array([22050, 11025, 4410])
        for i, L in enumerate(lengths):
            waves[i, L:] = 0
        got = np.asarray(mfcc_hopdft_batch(waves, SPEAKER, lengths=lengths))
        for i, L in enumerate(lengths):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i, :L].astype(np.float64), SPEAKER.utterance_length,
                sr=SPEAKER.sr, n_fft=SPEAKER.n_fft,
                hop_length=SPEAKER.hop_length,
                win_length=SPEAKER.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3)

    def test_pure_tone_no_worse_than_direct_int8(self):
        """Pure tones are the int8 digit scheme's worst input class (the
        truncated DFT constants surface in near-null bins inside the
        top_db window; docs/PARITY.md tolerance table). Pin that (a) the
        hop-block int8 variant is no worse than the shipped direct int8
        path there, and (b) the f32 hop-block path holds full parity."""
        from asr_using_robust_nn_tpu.ops.mfcc_hopdft import (
            mfcc_hopdft_batch, mfcc_hopdft_int8_batch)
        from asr_using_robust_nn_tpu.ops.mfcc_int8 import mfcc_int8_batch

        t = np.linspace(0, 1, 22050, dtype=np.float32)
        chirp = 0.7 * np.sin(2 * np.pi * (200 + 1800 * t) * t)
        waves = np.stack([chirp, 0.5 * np.sin(2 * np.pi * 440 * t)])
        want = [frontend_ref.mfcc_fixed_length_ref(w, 44) for w in waves]

        def maxerr(fn):
            got = np.asarray(fn(waves.astype(np.float32), DIGIT))
            return max(np.max(np.abs(g - w)) for g, w in zip(got, want))

        assert maxerr(mfcc_hopdft_batch) < 1e-3
        e_hop8 = maxerr(mfcc_hopdft_int8_batch)
        e_dir8 = maxerr(mfcc_int8_batch)
        assert e_hop8 <= e_dir8 * 1.2 + 1e-4, (e_hop8, e_dir8)
        # absolute ceiling too (the relative bound alone would inflate
        # silently if the direct path itself regressed): PARITY.md records
        # ~3.4e-3 worst-case for this input class
        assert e_hop8 < 5e-3 and e_dir8 < 5e-3, (e_hop8, e_dir8)

    def test_dispatcher_exposes_and_gates(self, rng):
        from asr_using_robust_nn_tpu.frontend.mfcc import Frontend

        waves = (rng.standard_normal((2, 22050)) * 0.3).astype(np.float32)
        got = np.asarray(Frontend(DIGIT, backend="hopdft")(waves))
        want = np.asarray(Frontend(DIGIT, backend="xla")(waves))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
        # speaker preset: f32 variant accepted (tail-matmul generalization),
        # int8 variant rejected at construction (no exact roots, no tail)
        got = np.asarray(Frontend(SPEAKER, backend="hopdft")(waves))
        want = np.asarray(Frontend(SPEAKER, backend="xla")(waves))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
        with pytest.raises(ValueError, match="hop"):
            Frontend(SPEAKER, backend="hopdft_int8")
        # a window shorter than n_fft stays rejected for both
        import dataclasses
        partial_win = dataclasses.replace(DIGIT, win_length=1024)
        with pytest.raises(ValueError, match="win"):
            Frontend(partial_win, backend="hopdft")


class TestInt8PallasFused:
    """ops/pallas_mfcc.py::mfcc_pallas_int8_batch (interpret mode: the
    Mosaic path needs a real TPU; this pins the kernel's math)."""

    @pytest.mark.parametrize("cfg", [DIGIT, SPEAKER], ids=["digit", "speaker"])
    def test_matches_oracle(self, cfg, rng):
        from asr_using_robust_nn_tpu.ops.pallas_mfcc import (
            mfcc_pallas_int8_batch)

        amps = np.array([0.05, 0.3, 1.0])[:, None]
        waves = (rng.standard_normal((3, 22050)) * amps).astype(np.float32)
        got = np.asarray(mfcc_pallas_int8_batch(waves, cfg, interpret=True))
        for i in range(3):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], cfg.utterance_length, sr=cfg.sr, n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, win_length=cfg.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=1e-3, rtol=1e-4)


class TestFrontendDispatcher:
    """frontend/mfcc.py::Frontend — auto resolves per measured preset."""

    def test_auto_selection_per_preset_and_platform(self):
        from asr_using_robust_nn_tpu.frontend.mfcc import (
            Frontend,
            _auto_backend,
        )

        # int8 wins only on the TPU MXU (2x int8 rate) AND at large n_fft
        assert _auto_backend(DIGIT, "tpu") == "int8"
        assert _auto_backend(DIGIT, "axon") == "int8"
        assert _auto_backend(SPEAKER, "tpu") == "xla"   # n_fft=441
        assert _auto_backend(DIGIT, "cpu") == "xla"
        assert _auto_backend(DIGIT, "gpu") == "xla"
        # tests run on the CPU platform (conftest): auto resolves to xla
        assert Frontend(DIGIT).backend == "xla"
        with pytest.raises(ValueError):
            Frontend(DIGIT, backend="cudnn")

    def test_bad_dft_algorithm_rejected_eagerly(self):
        """Round-3 review: a typo'd dft_algorithm must fail at config
        construction with the valid options listed, not as a bare KeyError
        inside the first jitted trace."""
        with pytest.raises(ValueError, match="bf16_x6"):
            FrontendConfig(n_fft=441, hop_length=220, win_length=441,
                           utterance_length=101, dft_algorithm="bf16x6")

    def test_int8_matches_xla_at_parity(self, rng):
        from asr_using_robust_nn_tpu.frontend.mfcc import Frontend

        waves = (rng.standard_normal((4, 22050)) * 0.3).astype(np.float32)
        lengths = np.array([22050, 22050, 15000, 8000])
        got = np.asarray(Frontend(DIGIT, backend="int8")(
            waves, lengths=lengths))
        want = np.asarray(Frontend(DIGIT, backend="xla")(
            waves, lengths=lengths))
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)
        flat = Frontend(DIGIT, backend="int8").flat(waves)
        assert flat.shape == (4, DIGIT.n_mfcc * DIGIT.utterance_length)


class TestOddNfftFrameCount:
    def test_speaker_length_divisible_by_hop(self, rng):
        """Odd n_fft (441) + length divisible by hop (220): librosa yields
        1 + (n-1)//hop frames, one FEWER than the even-n_fft formula —
        regression for the off-by-one caught in review."""
        n = 22000  # divisible by 220
        assert frontend_ref.num_frames(n, 220, 441) == 100
        y = (rng.standard_normal(n) * 0.1).astype(np.float32)
        p = frontend_ref.stft_power_ref(y, 441, 220, 441)
        assert p.shape[1] == 100
        # batched kernel agrees: frame 100 is masked out for a padded batch
        waves = np.zeros((1, 22050), np.float32)
        waves[0, :n] = y
        got = np.asarray(
            mfcc_xla_batch(waves, SPEAKER, lengths=np.array([n]))
        )
        want = frontend_ref.mfcc_fixed_length_ref(
            y, 101, n_fft=441, hop_length=220, win_length=441
        )
        np.testing.assert_allclose(got[0], want, atol=2e-3, rtol=1e-4)
        assert np.all(got[0][:, 100:] == 0)


class TestFrontendProperties:
    def test_amplitude_scaling_shifts_only_c0(self, rng):
        """power_to_db turns amplitude scaling into a constant db shift, and
        the orthonormal DCT maps a constant mel vector onto coefficient 0
        only: mfcc(a*x)[1:] == mfcc(x)[1:], c0 shifts by
        20*log10(a)*sqrt(n_mels)."""
        x = (rng.standard_normal((1, 22050)) * 0.05).astype(np.float32)
        a = 4.0
        m1 = np.asarray(mfcc_xla_batch(x, DIGIT))[0]
        m2 = np.asarray(mfcc_xla_batch(a * x, DIGIT))[0]
        np.testing.assert_allclose(m2[1:], m1[1:], atol=3e-3)
        expected_shift = 20 * np.log10(a) * np.sqrt(128)
        np.testing.assert_allclose(
            m2[0] - m1[0], expected_shift, atol=3e-3
        )

    def test_batch_order_invariance(self, rng):
        waves = (rng.standard_normal((4, 22050)) * 0.1).astype(np.float32)
        out = np.asarray(mfcc_xla_batch(waves, DIGIT))
        out_rev = np.asarray(mfcc_xla_batch(waves[::-1].copy(), DIGIT))
        np.testing.assert_allclose(out, out_rev[::-1], atol=1e-5)

    def test_resampler_linearity(self, rng):
        from asr_using_robust_nn_tpu.utils.audio_io import resample

        x = rng.standard_normal(16000).astype(np.float32)
        y = rng.standard_normal(16000).astype(np.float32)
        lhs = resample(x + 2 * y, 16000, 22050)
        rhs = resample(x, 16000, 22050) + 2 * resample(y, 16000, 22050)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)


class TestBF16X3PallasFused:
    """ops/pallas_mfcc.py::mfcc_pallas_bf16x3_batch (interpret mode pins
    the kernel math; the Mosaic path needs a real TPU). X3-class parity:
    ~2e-3 absolute on dB-scale features."""

    @pytest.mark.parametrize("cfg", [DIGIT, SPEAKER], ids=["digit", "speaker"])
    def test_matches_oracle(self, cfg, rng):
        from asr_using_robust_nn_tpu.ops.pallas_mfcc import (
            mfcc_pallas_bf16x3_batch)

        amps = np.array([0.05, 0.3, 1.0])[:, None]
        waves = (rng.standard_normal((3, 22050)) * amps).astype(np.float32)
        got = np.asarray(mfcc_pallas_bf16x3_batch(waves, cfg, interpret=True))
        for i in range(3):
            want = frontend_ref.mfcc_fixed_length_ref(
                waves[i], cfg.utterance_length, sr=cfg.sr, n_fft=cfg.n_fft,
                hop_length=cfg.hop_length, win_length=cfg.win_length,
            )
            np.testing.assert_allclose(got[i], want, atol=8e-3, rtol=1e-3)

    def test_split_reconstructs(self, rng):
        """hi + lo bf16 digits reconstruct f32 to ~2^-16 relative."""
        import jax.numpy as jnp

        x = (rng.standard_normal((64,)) * 10).astype(np.float32)
        xj = jnp.asarray(x)
        hi = xj.astype(jnp.bfloat16)
        lo = (xj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rec = np.asarray(hi.astype(jnp.float32) + lo.astype(jnp.float32))
        np.testing.assert_allclose(rec, x, rtol=2e-5)

"""Frozen golden vectors: detect silent drift in the oracle or kernels.

The fixtures were generated from the numpy oracle at round 1 (after the
odd-n_fft frame-count fix) — both the oracle and the XLA kernels must keep
reproducing them bit-for-bit (oracle) / within fp32 tolerance (kernels).
"""

import os

import numpy as np

from asr_using_robust_nn_tpu.ops import filters, frontend_ref
from asr_using_robust_nn_tpu.ops.mfcc_xla import FrontendConfig, mfcc_xla_batch

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden_mfcc.npz"))
NAMES = ["chirp", "tone_noise", "impulses"]


class TestGoldenOracle:
    def test_oracle_reproduces_digit(self):
        for n in NAMES:
            got = frontend_ref.mfcc_fixed_length_ref(GOLD[f"in_{n}"], 44)
            np.testing.assert_allclose(got, GOLD[f"digit_{n}"], rtol=1e-12)

    def test_oracle_reproduces_speaker(self):
        for n in NAMES:
            got = frontend_ref.mfcc_fixed_length_ref(
                GOLD[f"in_{n}"], 101, n_fft=441, hop_length=220, win_length=441
            )
            np.testing.assert_allclose(got, GOLD[f"speaker_{n}"], rtol=1e-12)

    def test_constants_frozen(self):
        np.testing.assert_allclose(
            filters.mel_filterbank(22050, 2048, 128).sum(axis=1),
            GOLD["mel_fb_digit_sum"], rtol=1e-12,
        )
        np.testing.assert_allclose(
            filters.dct_matrix(20, 128)[0], GOLD["dct_row0"], rtol=1e-12
        )


class TestGoldenKernels:
    def test_xla_matches_golden(self):
        waves = np.stack([GOLD[f"in_{n}"] for n in NAMES])
        got = np.asarray(mfcc_xla_batch(waves, FrontendConfig.digit()))
        want = np.stack([GOLD[f"digit_{n}"] for n in NAMES])
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)
        got_s = np.asarray(mfcc_xla_batch(waves, FrontendConfig.speaker()))
        want_s = np.stack([GOLD[f"speaker_{n}"] for n in NAMES])
        np.testing.assert_allclose(got_s, want_s, atol=2e-3, rtol=1e-4)

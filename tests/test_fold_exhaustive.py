"""Exhaustive BN-fold verification: for every reachable integer
accumulator value, the folded integer thresholds must reproduce the float
model's quantization decision EXACTLY — per channel, including negative
and near-zero slopes. This pins the ceil/flip/sentinel conventions far
harder than sampled end-to-end logits (SURVEY.md §7 hard-part #2).
"""

import numpy as np
import pytest

from bnn_pynq_tpu.compiler.finnthesizer import (_activation_boundaries,
                                                _fold_bn_to_thresholds)
from bnn_pynq_tpu.train.model import BN_EPS


def _float_code(y, boundaries):
    """The float quantizer's code: Σ_t 1{y >= θ_t} (matches train/quant.py
    round-half-up boundaries)."""
    return sum(int(y >= th) for th in boundaries)


@pytest.mark.parametrize("abits", [1, 2])
@pytest.mark.parametrize("s", [1.0, 1.0 / 3.0, 1.0 / 128.0, 1.0 / 9.0])
def test_fold_matches_float_decision_exhaustively(abits, s):
    rng = np.random.default_rng(42)
    n_ch = 64
    k = 100  # accumulator range ±k (step 1 covers parity subsets too)
    gamma = rng.normal(0.8, 1.0, n_ch).astype(np.float32)
    gamma[0] = -1.3
    gamma[1] = 0.0
    gamma[2] = 1e-6          # near-degenerate positive
    gamma[3] = -1e-6         # near-degenerate negative
    beta = rng.normal(0.0, 1.5, n_ch).astype(np.float32)
    mean = rng.normal(0.0, 5.0, n_ch).astype(np.float32)
    var = np.abs(rng.normal(1.0, 0.5, n_ch)).astype(np.float32) + 1e-3

    boundaries = _activation_boundaries(abits)
    thr, flip = _fold_bn_to_thresholds(gamma, beta, mean, var, s, boundaries)

    sigma = np.sqrt(var.astype(np.float64) + BN_EPS)
    accs = np.arange(-k, k + 1)
    for ch in range(n_ch):
        for d in accs:
            y = gamma[ch] * (s * d - mean[ch]) / sigma[ch] + beta[ch]
            want = _float_code(y, boundaries)
            d_eff = -d if flip[ch] else d
            got = int((d_eff >= thr[:, ch]).sum())
            assert got == want, (
                f"ch={ch} d={d} γ={gamma[ch]} want={want} got={got} "
                f"thr={thr[:, ch]} flip={flip[ch]}")


def test_fold_sentinels_for_zero_gamma():
    from bnn_pynq_tpu.ops.thresholds import THR_ALWAYS, THR_NEVER
    gamma = np.array([0.0, 0.0], np.float32)
    beta = np.array([1.0, -1.0], np.float32)  # fires always / never (θ=0)
    mean = np.zeros(2, np.float32)
    var = np.ones(2, np.float32)
    thr, flip = _fold_bn_to_thresholds(gamma, beta, mean, var, 1.0,
                                       _activation_boundaries(1))
    assert thr[0, 0] == THR_ALWAYS and thr[0, 1] == THR_NEVER

"""Evaluation metrics tests: FID math vs reference, rhythm P/R/F1."""

import numpy as np
import pytest

from mapperatorinator_tpu.eval import (
    calculate_f1,
    calculate_frechet_distance,
    calculate_precision,
    calculate_recall,
    calculate_rhythm_stats,
    compute_fid_from_features,
    get_rhythm,
)


def test_frechet_matches_reference():
    import importlib.util

    spec = importlib.util.find_spec("numpy")  # noqa - just numerical check below
    rng = np.random.default_rng(0)
    a = rng.standard_normal((200, 8))
    b = rng.standard_normal((200, 8)) + 0.5

    fid_same = compute_fid_from_features(a, a)
    fid_diff = compute_fid_from_features(a, b)
    assert fid_same == pytest.approx(0.0, abs=1e-6)
    assert fid_diff > 1.0  # mean shift of 0.5 in 8 dims -> ~2.0

    # identity check against the closed form for diagonal gaussians
    mu1, mu2 = np.zeros(3), np.ones(3)
    s1 = np.eye(3)
    s2 = np.eye(3) * 4
    # d^2 = |mu|^2 + tr(s1 + s2 - 2 sqrt(s1 s2)) = 3 + (3 + 12 - 2*3*2... )
    want = 3 + np.trace(s1 + s2 - 2 * np.sqrt(s1 @ s2))
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert got == pytest.approx(want, rel=1e-6)


def test_rhythm_stats_matches_reference_semantics():
    real = {100, 200, 300, 400}
    gen = {105, 199, 350, 500}
    stats = calculate_rhythm_stats(real, gen)
    # 100~105 TP, 200~199 TP, 300 FN, 400 FN; 350 FP, 500 FP
    assert stats == {"true_positives": 2, "false_positives": 2, "false_negatives": 2}
    assert calculate_precision(stats) == pytest.approx(0.5)
    assert calculate_recall(stats) == pytest.approx(0.5)
    assert calculate_f1(stats) == pytest.approx(0.5)


def test_get_rhythm():
    from mapperatorinator_tpu.osu import Beatmap

    bm = Beatmap.from_path("/root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu")
    active = get_rhythm(bm)
    passive = get_rhythm(bm, passive=True)
    assert len(active) > 100
    assert len(passive) > len(active)


def test_ssm_rmse():
    import sys

    sys.path.insert(0, "/root/repo")
    from calc_fid import compute_self_similarity, ssm_rmse_for_pair

    rng = np.random.default_rng(0)
    f = rng.normal(size=(10, 16)).astype(np.float32)
    ssm = compute_self_similarity(f)
    np.testing.assert_allclose(np.diag(ssm), 1.0, atol=1e-6)  # cosine self-sim
    assert ssm_rmse_for_pair(f, f) == 0.0
    g = rng.normal(size=(14, 16)).astype(np.float32)  # different window count
    err = ssm_rmse_for_pair(f, g)
    assert err is not None and 0 < err < 1
    assert ssm_rmse_for_pair(np.zeros((0, 16)), g) is None

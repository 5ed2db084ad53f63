"""Assignment-policy tests — aslam_cv_matcher engine parity
(test-matcher.cc / test-matcher-non-exclusive.cc semantics)."""

import numpy as np

from asdslam_tpu.ops import assignment


def _brute_greedy(score, valid, min_score):
    """Reference implementation: sort all admissible pairs, commit best-first."""
    N, M = score.shape
    pairs = [(score[i, j], i, j) for i in range(N) for j in range(M)
             if valid[i, j] and score[i, j] >= min_score]
    pairs.sort(key=lambda t: -t[0])
    used_r, used_c = set(), set()
    out = np.full(N, -1, np.int32)
    for s, i, j in pairs:
        if i not in used_r and j not in used_c:
            out[i] = j
            used_r.add(i)
            used_c.add(j)
    return out


def test_greedy_matches_brute_force():
    rng = np.random.default_rng(0)
    for trial in range(5):
        N, M = 13, 9
        score = rng.normal(size=(N, M)).astype(np.float32)
        valid = rng.random((N, M)) > 0.3
        col, ok = assignment.greedy_assignment(score, valid, min_score=-1.0)
        ref = _brute_greedy(score, valid, -1.0)
        np.testing.assert_array_equal(np.asarray(col), ref)
        assert np.array_equal(np.asarray(ok), ref >= 0)


def test_greedy_exclusivity():
    # two rows both prefer column 0; only the better one gets it
    score = np.array([[5.0, 1.0], [4.0, 3.0]], np.float32)
    valid = np.ones((2, 2), bool)
    col, ok = assignment.greedy_assignment(score, valid)
    assert col[0] == 0 and col[1] == 1 and ok.all()


def test_non_exclusive_shares_columns():
    score = np.array([[5.0, 1.0], [4.0, 3.0]], np.float32)
    valid = np.ones((2, 2), bool)
    col, s, ok = assignment.non_exclusive_assignment(score, valid)
    assert list(np.asarray(col)) == [0, 0] and ok.all()
    col, s, ok = assignment.non_exclusive_assignment(score, valid, min_score=4.5)
    assert np.asarray(ok).tolist() == [True, False]


def test_greedy_all_invalid():
    score = np.zeros((3, 3), np.float32)
    col, ok = assignment.greedy_assignment(score, np.zeros((3, 3), bool))
    assert (np.asarray(col) == -1).all() and not np.asarray(ok).any()

"""Device banded edit-distance kernel (ops.align_pallas) vs dense oracle."""

import numpy as np
import pytest

from ccs_tpu.ops.align_pallas import (BIG, edit_distance_banded,
                                      edit_distance_dense_oracle)


def _pairs(rng, n, tmax, rmax, err=0.12):
    tpl = np.full((n, tmax), -1, np.int8)
    tlen = np.zeros(n, np.int32)
    reads = np.full((n, rmax), -1, np.int8)
    rlens = np.zeros(n, np.int32)
    for b in range(n):
        T = int(rng.integers(8, tmax + 1))
        t = rng.integers(0, 4, T).astype(np.int8)
        r = []
        for j in range(T):
            u = rng.random()
            if u < err / 3:
                continue                       # deletion
            r.append(int(t[j]) if u > err else int(rng.integers(0, 4)))
            if rng.random() < err / 3:
                r.append(int(rng.integers(0, 4)))
        r = np.asarray(r[:rmax], np.int8)
        tpl[b, :T] = t
        tlen[b] = T
        reads[b, :len(r)] = r
        rlens[b] = len(r)
    return tpl, tlen, reads, rlens


def test_matches_dense_oracle_interpret():
    rng = np.random.default_rng(0)
    tpl, tlen, reads, rlens = _pairs(rng, 10, 40, 52)
    # band >= max(T, R) => the band covers every cell: exact equality
    d = np.asarray(edit_distance_banded(tpl, tlen, reads, rlens, band=56,
                                        interpret=True))
    for b in range(10):
        want = edit_distance_dense_oracle(
            reads[b, :rlens[b]], tpl[b, :tlen[b]])
        assert d[b] == want, (b, d[b], want)


def test_moderate_band_still_exact_for_smrt_like_drift():
    # at SMRT-like error rates the optimal path's |j - i| drift is far
    # below the band, so a moderate band reproduces the dense distance
    rng = np.random.default_rng(1)
    tpl, tlen, reads, rlens = _pairs(rng, 8, 60, 80, err=0.12)
    d = np.asarray(edit_distance_banded(tpl, tlen, reads, rlens, band=24,
                                        interpret=True))
    for b in range(8):
        want = edit_distance_dense_oracle(
            reads[b, :rlens[b]], tpl[b, :tlen[b]])
        assert d[b] == want, (b, d[b], want)


def test_band_exceeded_reports_big():
    tpl = np.zeros((1, 40), np.int8)
    tlen = np.asarray([40], np.int32)
    reads = np.zeros((1, 8), np.int8)
    rlens = np.asarray([4], np.int32)   # |T - R| = 36 > band 16
    d = np.asarray(edit_distance_banded(tpl, tlen, reads, rlens, band=16,
                                        interpret=True))
    assert d[0] >= BIG / 2


def test_empty_read_is_all_gaps():
    tpl = np.zeros((1, 12), np.int8)
    tlen = np.asarray([12], np.int32)
    reads = np.full((1, 4), -1, np.int8)
    rlens = np.asarray([0], np.int32)
    d = np.asarray(edit_distance_banded(tpl, tlen, reads, rlens, band=16,
                                        interpret=True))
    assert d[0] == 12.0

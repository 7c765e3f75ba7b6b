"""Affine-gap (Gotoh/KSW2-equivalent) aligner tests — ops.align.affine_align.

Oracle: full unbanded 3-matrix Gotoh DP in plain Python.
Reference behavior: /root/reference/docs/how-does-ccs-work.md:53-55 (KSW2
affine-gap alignment of subreads to the draft).
"""

import numpy as np
import pytest

from ccs_tpu.ops import dna
from ccs_tpu.ops.align import affine_align, edit_align


def gotoh_oracle_score(read, tpl, sub, open_, ext):
    R, T = len(read), len(tpl)
    BIG = 1 << 28
    V = [[BIG] * (T + 1) for _ in range(R + 1)]
    I = [[BIG] * (T + 1) for _ in range(R + 1)]
    D = [[BIG] * (T + 1) for _ in range(R + 1)]
    V[0][0] = 0
    for j in range(1, T + 1):
        D[0][j] = min(V[0][j - 1] + open_ + ext, D[0][j - 1] + ext)
        V[0][j] = D[0][j]
    for i in range(1, R + 1):
        I[i][0] = min(V[i - 1][0] + open_ + ext, I[i - 1][0] + ext)
        V[i][0] = I[i][0]
        for j in range(1, T + 1):
            m = V[i - 1][j - 1] + (0 if read[i - 1] == tpl[j - 1] else sub)
            I[i][j] = min(V[i - 1][j] + open_ + ext, I[i - 1][j] + ext)
            D[i][j] = min(V[i][j - 1] + open_ + ext, D[i][j - 1] + ext)
            V[i][j] = min(m, I[i][j], D[i][j])
    return V[R][T]


def cigar_cost(aln, sub, open_, ext, read, tpl):
    """Recompute the affine cost of the returned cigar independently."""
    cost = 0
    i = j = 0
    for n, op in aln.cigar:
        if op == "M":
            for _ in range(n):
                cost += 0 if read[i] == tpl[j] else sub
                i, j = i + 1, j + 1
        elif op == "I":
            cost += open_ + n * ext
            i += n
        else:
            cost += open_ + n * ext
            j += n
    assert i == len(read) and j == len(tpl)
    return cost


@pytest.mark.parametrize("seed", range(8))
def test_affine_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(10, 60))
    tpl = rng.integers(0, 4, T).astype(np.int8)
    # mutate: subs + multi-base indels
    read = list(tpl)
    for _ in range(int(rng.integers(1, 5))):
        p = int(rng.integers(0, len(read)))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            read[p] = (read[p] + 1) % 4
        elif kind == 1:
            for b in rng.integers(0, 4, int(rng.integers(1, 6))):
                read.insert(p, np.int8(b))
        else:
            del read[p:p + int(rng.integers(1, 6))]
    read = np.array(read, dtype=np.int8)
    sub, op, ext = 6, 2, 2
    want = gotoh_oracle_score(read, tpl, sub, op, ext)
    aln = affine_align(read, tpl, band=max(len(read), T),
                       sub_cost=sub, gap_open=op, gap_ext=ext)
    assert aln is not None
    assert aln.score == want
    # the cigar must actually cost what the DP claims
    assert cigar_cost(aln, sub, op, ext, read, tpl) == want


def test_long_gap_collapses_to_one_run():
    rng = np.random.default_rng(3)
    tpl = rng.integers(0, 4, 120).astype(np.int8)
    read = np.concatenate([tpl[:50], tpl[70:]])  # clean 20bp deletion
    aln = affine_align(read, tpl)
    dels = [(n, op) for n, op in aln.cigar if op == "D"]
    assert dels == [(20, "D")]
    # linear-cost aligner may scatter; affine must not
    assert aln.n_match == len(read)


def test_rpos_monotone_and_endpoints():
    rng = np.random.default_rng(7)
    tpl = rng.integers(0, 4, 200).astype(np.int8)
    read = np.array(list(tpl[:80]) + [0, 1, 2, 3] + list(tpl[80:]),
                    dtype=np.int8)
    aln = affine_align(read, tpl)
    assert aln is not None
    assert (np.diff(aln.rpos_at) >= 0).all()
    assert aln.rpos_at[0] == 0 and aln.rpos_at[-1] == len(read)


def test_affine_equals_edit_when_costs_linear():
    """gap_open=0 makes Gotoh collapse to the linear-cost DP."""
    rng = np.random.default_rng(11)
    for _ in range(4):
        tpl = rng.integers(0, 4, 50).astype(np.int8)
        read = tpl.copy()
        read[10] = (read[10] + 1) % 4
        read = np.delete(read, 30)
        a = affine_align(read, tpl, band=60, sub_cost=3, gap_open=0,
                         gap_ext=2)
        e = edit_align(read, tpl, band=60, sub_cost=3, gap_cost=2)
        assert a.score == e.score


def test_native_matches_numpy():
    """If the native lib is present, both paths must agree exactly."""
    from ccs_tpu import native
    if native.load() is None or not hasattr(native.load(), "ccs_affine_align"):
        pytest.skip("native lib not built")
    import os
    rng = np.random.default_rng(5)
    for _ in range(5):
        tpl = rng.integers(0, 4, 150).astype(np.int8)
        read = np.concatenate(
            [tpl[:40], rng.integers(0, 4, 7).astype(np.int8), tpl[40:110],
             tpl[118:]])
        a_native = affine_align(read, tpl)
        os.environ["CCS_TPU_NO_NATIVE"] = "1"
        native._LIB, native._TRIED = None, False
        try:
            a_np = affine_align(read, tpl)
        finally:
            del os.environ["CCS_TPU_NO_NATIVE"]
            native._LIB, native._TRIED = None, False
        assert a_native.score == a_np.score
        assert a_native.cigar == a_np.cigar
        assert (a_native.rpos_at == a_np.rpos_at).all()

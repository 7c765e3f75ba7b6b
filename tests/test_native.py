"""Native C++ host kernels vs their NumPy oracles (ccs_tpu/native)."""

import os

import numpy as np
import pytest

from ccs_tpu import native


def _mutate(tpl, rng):
    read = []
    for b in tpl:
        r = rng.random()
        if r < 0.05:
            continue
        if r < 0.10:
            read.extend([b, rng.integers(0, 4)])
        elif r < 0.13:
            read.append((b + 1) % 4)
        else:
            read.append(b)
    return np.asarray(read, np.int8)


@pytest.mark.skipif(native.load() is None, reason="native toolchain missing")
def test_native_edit_align_matches_numpy(monkeypatch):
    from ccs_tpu.ops import align as A
    rng = np.random.default_rng(0)
    cases = []
    for trial in range(40):
        T = int(rng.integers(1, 260))
        tpl = rng.integers(0, 4, T).astype(np.int8)
        read = _mutate(tpl, rng)
        sc, gc = (1, 1) if trial % 2 else (3, 2)
        cases.append((read, tpl, sc, gc))

    def run_all():
        return [A.edit_align(r, t, sub_cost=s, gap_cost=g)
                for r, t, s, g in cases]

    nats = run_all()
    monkeypatch.setenv("CCS_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    refs = run_all()
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)

    for i, (ref, nat) in enumerate(zip(refs, nats)):
        if ref is None:
            assert nat is None, i
            continue
        assert nat.score == ref.score, i
        assert nat.cigar == ref.cigar, i
        np.testing.assert_array_equal(nat.rpos_at, ref.rpos_at, err_msg=str(i))
        assert nat.n_match == ref.n_match, i

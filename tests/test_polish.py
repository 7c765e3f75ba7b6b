"""Polish engine tests: mutation machinery + convergence to the true template."""

import numpy as np
import pytest

import jax.numpy as jnp

from ccs_tpu.models.chemistry import default_params
from ccs_tpu.ops import dna, hmm_jax
from ccs_tpu.pipeline import polish
from ccs_tpu.sim.simulator import simulate_read


@pytest.fixture(scope="module")
def params():
    return default_params()


@pytest.fixture(scope="module")
def tables(params):
    return hmm_jax.params_to_device(params)


def _pad(seq, cap):
    out = np.full(cap, -1, np.int8)
    out[:len(seq)] = seq
    return out


class TestMutants:
    def test_shapes_and_edits(self):
        tpl = jnp.asarray([[0, 1, 2, 3, -1, -1]], dtype=jnp.int8)
        tlen = jnp.asarray([4], dtype=jnp.int32)
        mt, ml, valid = polish.make_mutants(tpl, tlen)
        assert mt.shape == (1, 8 * 6 + 4, 6)
        mt, ml, valid = map(np.asarray, (mt, ml, valid))
        # substitution kind 0 at pos 1: base 1 -> 2
        m = 1 * 8 + 0
        np.testing.assert_array_equal(mt[0, m, :4], [0, 2, 2, 3])
        assert ml[0, m] == 4 and valid[0, m]
        # deletion at pos 2
        m = 2 * 8 + 3
        np.testing.assert_array_equal(mt[0, m, :3], [0, 1, 3])
        assert ml[0, m] == 3 and mt[0, m, 3] == -1
        # insertion of base 3 after pos 0
        m = 0 * 8 + 4 + 3
        np.testing.assert_array_equal(mt[0, m, :5], [0, 3, 1, 2, 3])
        assert ml[0, m] == 5
        # mutations at pos >= tlen invalid
        assert not valid[0, 4 * 8]
        # prepend mutation: base 2 before position 0
        m = 8 * 6 + 2
        np.testing.assert_array_equal(mt[0, m, :5], [2, 0, 1, 2, 3])
        assert ml[0, m] == 5 and valid[0, m]

    def test_apply_matches_make(self):
        rng = np.random.default_rng(0)
        tpl = jnp.asarray(rng.integers(0, 4, (3, 10)), dtype=jnp.int8)
        tlen = jnp.asarray([10, 10, 10], jnp.int32)
        cs = jnp.asarray([2, 2, 2], jnp.int32)
        ce = jnp.asarray([8, 8, 8], jnp.int32)
        mt, ml, _ = polish.make_mutants(tpl, tlen)
        for mut_id in [0, 8 + 3, 3 * 8 + 5, 9 * 8 + 3]:
            ids = jnp.asarray([mut_id] * 3, jnp.int32)
            out, nl, _, _ = polish.apply_mutation(tpl, tlen, cs, ce, ids)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(mt[:, mut_id]))
            np.testing.assert_array_equal(np.asarray(nl), np.asarray(ml[:, mut_id]))

    def test_core_offsets(self):
        tpl = jnp.asarray(np.tile(np.arange(4, dtype=np.int8), (1, 3)).reshape(1, 12))
        tlen = jnp.asarray([12], jnp.int32)
        cs, ce = jnp.asarray([4], jnp.int32), jnp.asarray([8], jnp.int32)
        # deletion before core shifts both
        _, _, a, b = polish.apply_mutation(tpl, tlen, cs, ce, jnp.asarray([1 * 8 + 3]))
        assert (int(a[0]), int(b[0])) == (3, 7)
        # deletion inside core shifts only end
        _, _, a, b = polish.apply_mutation(tpl, tlen, cs, ce, jnp.asarray([5 * 8 + 3]))
        assert (int(a[0]), int(b[0])) == (4, 7)
        # insertion after pos 1 (edit idx 2, before core) shifts both
        _, _, a, b = polish.apply_mutation(tpl, tlen, cs, ce, jnp.asarray([1 * 8 + 4]))
        assert (int(a[0]), int(b[0])) == (5, 9)
        # insertion inside core grows end only
        _, _, a, b = polish.apply_mutation(tpl, tlen, cs, ce, jnp.asarray([5 * 8 + 4]))
        assert (int(a[0]), int(b[0])) == (4, 9)
        # deletion after core: no change
        _, _, a, b = polish.apply_mutation(tpl, tlen, cs, ce, jnp.asarray([9 * 8 + 3]))
        assert (int(a[0]), int(b[0])) == (4, 8)


class TestPolish:
    def test_recovers_template(self, params, tables):
        """Windows whose draft has 1-3 errors converge to the true template."""
        rng = np.random.default_rng(42)
        T_CAP, R_CAP, C = 32, 48, 12
        B = 6
        tpl = np.full((B, T_CAP), -1, np.int8)
        tlen = np.zeros(B, np.int32)
        reads = np.full((B, C, R_CAP), -1, np.int8)
        rlens = np.full((B, C), -1, np.int32)
        truths = []
        for b in range(B):
            truth = rng.integers(0, 4, 24).astype(np.int8)
            truths.append(truth)
            corrupt = truth.copy().tolist()
            # up to 3 edits
            for _ in range(rng.integers(1, 4)):
                op = rng.integers(0, 3)
                p = int(rng.integers(0, len(corrupt)))
                if op == 0:
                    corrupt[p] = (corrupt[p] + 1) % 4
                elif op == 1 and len(corrupt) > 2:
                    del corrupt[p]
                else:
                    corrupt.insert(p, int(rng.integers(0, 4)))
            corrupt = np.asarray(corrupt, np.int8)
            tpl[b, :len(corrupt)] = corrupt
            tlen[b] = len(corrupt)
            for c in range(C):
                r = simulate_read(truth, params, 4, rng)[:R_CAP]
                reads[b, c, :len(r)] = r
                rlens[b, c] = len(r)
        state, qv, p_err = polish.polish_windows(
            jnp.asarray(tpl), jnp.asarray(tlen),
            jnp.zeros(B, jnp.int32), jnp.asarray(tlen, jnp.int32),
            jnp.full(B, 4, jnp.int32),
            jnp.asarray(reads), jnp.asarray(rlens), tables, max_iters=12)
        n_exact = 0
        for b in range(B):
            got = np.asarray(state.tpl[b, :int(state.tlen[b])])
            if np.array_equal(got, truths[b]):
                n_exact += 1
        assert n_exact >= B - 1, f"only {n_exact}/{B} windows recovered exactly"
        assert not bool(np.asarray(state.active).any()), "polish did not converge"

    def test_qv_sane(self, params, tables):
        """High coverage -> high QV; ambiguous positions -> lower QV."""
        rng = np.random.default_rng(7)
        truth = rng.integers(0, 4, 20).astype(np.int8)
        C = 16
        R_CAP = 48
        reads = np.full((1, C, R_CAP), -1, np.int8)
        rlens = np.full((1, C), -1, np.int32)
        for c in range(C):
            r = simulate_read(truth, params, 5, rng)[:R_CAP]
            reads[1 - 1, c, :len(r)] = r
            rlens[0, c] = len(r)
        tpl = np.full((1, 32), -1, np.int8)
        tpl[0, :20] = truth
        state, qv, p_err = polish.polish_windows(
            jnp.asarray(tpl), jnp.asarray([20], jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.asarray([20], jnp.int32),
            jnp.asarray([5], jnp.int32),
            jnp.asarray(reads), jnp.asarray(rlens), tables, max_iters=8)
        qv = np.asarray(qv)[0, :int(state.tlen[0])]
        assert qv.mean() > 25.0, f"mean QV too low: {qv.mean()}"

    def test_no_coverage_inactive(self, tables):
        tpl = np.full((1, 32), -1, np.int8)
        tpl[0, :5] = [0, 1, 2, 3, 0]
        state, qv, p_err = polish.polish_windows(
            jnp.asarray(tpl), jnp.asarray([5], jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.asarray([5], jnp.int32),
            jnp.asarray([0], jnp.int32),
            jnp.full((1, 2, 8), -1, jnp.int8),
            jnp.full((1, 2), -1, jnp.int32), tables, max_iters=4)
        assert int(state.n_iter[0]) == 0
        np.testing.assert_array_equal(np.asarray(state.tpl[0, :5]), [0, 1, 2, 3, 0])

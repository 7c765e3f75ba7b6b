"""Pair-HMM correctness: oracle vs brute force, forward≡backward, JAX vs oracle."""

import numpy as np
import pytest

from ccs_tpu.models.chemistry import ArrowParams, default_params
from ccs_tpu.ops import dna, hmm_oracle
from ccs_tpu.sim.simulator import simulate_read


@pytest.fixture(scope="module")
def params():
    return default_params()


class TestOracle:
    def test_forward_equals_bruteforce_tiny(self, params):
        rng = np.random.default_rng(1)
        for trial in range(20):
            tlen = rng.integers(1, 6)
            rlen = rng.integers(0, 7)
            tpl = rng.integers(0, 4, tlen).astype(np.int8)
            read = rng.integers(0, 4, rlen).astype(np.int8)
            f = hmm_oracle.forward_ll(tpl, read, params)
            bf = hmm_oracle.brute_force_ll(tpl, read, params)
            assert f == pytest.approx(bf, abs=1e-6), (tpl, read)

    def test_forward_equals_backward(self, params):
        rng = np.random.default_rng(2)
        for trial in range(10):
            tlen = rng.integers(1, 15)
            tpl = rng.integers(0, 4, tlen).astype(np.int8)
            read = simulate_read(tpl, params, 3, rng)
            f = hmm_oracle.forward_ll(tpl, read, params, 3)
            b = hmm_oracle.backward_matrix(tpl, read, params, 3)[0, 0]
            assert f == pytest.approx(b, rel=1e-10)

    def test_true_template_scores_best(self, params):
        """The generating template should (usually) beat a mutated one given
        enough reads — sanity that the likelihood is discriminative."""
        rng = np.random.default_rng(3)
        tpl = rng.integers(0, 4, 20).astype(np.int8)
        reads = [simulate_read(tpl, params, 4, rng) for _ in range(12)]
        mutant = tpl.copy()
        mutant[10] = (mutant[10] + 1) % 4
        ll_true = sum(hmm_oracle.forward_ll(tpl, r, params, 4) for r in reads)
        ll_mut = sum(hmm_oracle.forward_ll(mutant, r, params, 4) for r in reads)
        assert ll_true > ll_mut

    def test_empty_read(self, params):
        tpl = np.array([0, 1, 2], dtype=np.int8)
        f = hmm_oracle.forward_ll(tpl, np.array([], dtype=np.int8), params)
        # only path: three deletions
        _, _, del_p = hmm_oracle.position_tables(tpl, params, 0)
        assert f == pytest.approx(float(np.log(del_p).sum()), abs=1e-6)


class TestJaxForward:
    def test_matches_oracle(self, params):
        import jax.numpy as jnp
        from ccs_tpu.ops import hmm_jax

        rng = np.random.default_rng(4)
        tables = hmm_jax.params_to_device(params)
        B, C, T, R = 5, 4, 24, 40
        tpl = np.full((B, T), dna.PAD, np.int8)
        tlen = np.zeros(B, np.int32)
        reads = np.full((B, C, R), dna.PAD, np.int8)
        rlens = np.full((B, C), -1, np.int32)
        snr_bin = rng.integers(0, 8, B).astype(np.int32)
        cases = []
        for b in range(B):
            tl = int(rng.integers(5, T + 1))
            t = rng.integers(0, 4, tl).astype(np.int8)
            tpl[b, :tl] = t
            tlen[b] = tl
            for c in range(C - 1):  # leave last lane absent
                r = simulate_read(t, params, int(snr_bin[b]), rng)[:R]
                reads[b, c, :len(r)] = r
                rlens[b, c] = len(r)
                cases.append((b, c, t, r))
        ll = np.asarray(hmm_jax.forward_batch(
            jnp.asarray(tpl), jnp.asarray(tlen), jnp.asarray(snr_bin),
            jnp.asarray(reads), jnp.asarray(rlens), tables))
        for b, c, t, r in cases:
            want = hmm_oracle.forward_ll(t, r, params, int(snr_bin[b]))
            assert ll[b, c] == pytest.approx(want, rel=1e-4, abs=1e-3), (b, c)
        # absent lanes are exactly 0
        np.testing.assert_array_equal(ll[:, -1], 0.0)

    def test_empty_read_lane(self, params):
        import jax.numpy as jnp
        from ccs_tpu.ops import hmm_jax

        tables = hmm_jax.params_to_device(params)
        tpl = np.array([[0, 1, 2, dna.PAD]], np.int8)
        ll = np.asarray(hmm_jax.forward_batch(
            jnp.asarray(tpl), jnp.asarray([3], np.int32),
            jnp.asarray([0], np.int32),
            jnp.full((1, 1, 4), dna.PAD, np.int8),
            jnp.asarray([[0]], np.int32), tables))
        want = hmm_oracle.forward_ll(np.array([0, 1, 2], np.int8),
                                     np.array([], np.int8), params, 0)
        assert ll[0, 0] == pytest.approx(want, rel=1e-5)

    def test_batch_padding_invariance(self, params):
        """batch-of-1 == batched (SURVEY.md §4.2(2))."""
        import jax.numpy as jnp
        from ccs_tpu.ops import hmm_jax

        rng = np.random.default_rng(5)
        tables = hmm_jax.params_to_device(params)
        t = rng.integers(0, 4, 16).astype(np.int8)
        r = simulate_read(t, params, 2, rng)[:40]

        def run(T, R, C):
            tpl = np.full((1, T), dna.PAD, np.int8)
            tpl[0, :16] = t
            reads = np.full((1, C, R), dna.PAD, np.int8)
            reads[0, 0, :len(r)] = r
            rlens = np.full((1, C), -1, np.int32)
            rlens[0, 0] = len(r)
            return float(np.asarray(hmm_jax.forward_batch(
                jnp.asarray(tpl), jnp.asarray([16], np.int32),
                jnp.asarray([2], np.int32), jnp.asarray(reads),
                jnp.asarray(rlens), tables))[0, 0])

        a = run(16, len(r), 1)
        b = run(32, len(r) + 13, 7)
        assert a == pytest.approx(b, rel=1e-5)

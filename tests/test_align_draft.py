"""Tests for the banded aligner, anchor chaining, and draft generation."""

import numpy as np
import pytest

from ccs_tpu.models.chemistry import default_params
from ccs_tpu.ops import dna
from ccs_tpu.ops.align import (align_with_retry, anchor_chain, edit_align,
                               interp_read_pos)
from ccs_tpu.pipeline.draft import generate_draft, infer_orientation
from ccs_tpu.sim.simulator import simulate_read, simulate_zmw


def _edit_distance_dense(a, b):
    """Dense O(nm) edit distance for verification."""
    n, m = len(a), len(b)
    d = np.arange(m + 1)
    for i in range(1, n + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, m + 1):
            d[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]), prev[j] + 1, d[j - 1] + 1)
    return int(d[m])


class TestEditAlign:
    def test_identical(self):
        s = dna.encode(b"ACGTACGTACGT")
        aln = edit_align(s, s)
        assert aln.score == 0
        assert aln.cigar == [(12, "M")]
        np.testing.assert_array_equal(aln.rpos_at, np.arange(13))

    def test_matches_dense_dp(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            tlen = int(rng.integers(5, 80))
            tpl = rng.integers(0, 4, tlen).astype(np.int8)
            read = simulate_read(tpl, default_params(), 2, rng)
            aln = align_with_retry(read, tpl)
            assert aln is not None
            assert aln.score == _edit_distance_dense(read, tpl)

    def test_cigar_consistency(self):
        rng = np.random.default_rng(8)
        tpl = rng.integers(0, 4, 200).astype(np.int8)
        read = simulate_read(tpl, default_params(), 1, rng)
        aln = align_with_retry(read, tpl)
        n_read = sum(n for n, op in aln.cigar if op in "MI")
        n_tpl = sum(n for n, op in aln.cigar if op in "MD")
        assert n_read == len(read)
        assert n_tpl == len(tpl)
        # rpos_at is monotone and bounded
        assert np.all(np.diff(aln.rpos_at) >= 0)
        assert aln.rpos_at[0] == 0 and aln.rpos_at[-1] <= len(read)

    def test_empty_cases(self):
        tpl = dna.encode(b"ACGT")
        aln = edit_align(np.empty(0, np.int8), tpl)
        assert aln.score == 4
        aln = edit_align(tpl, np.empty(0, np.int8))
        assert aln.score == 4


class TestAnchors:
    def test_chain_recovers_mapping(self):
        rng = np.random.default_rng(9)
        tpl = rng.integers(0, 4, 2000).astype(np.int8)
        read = simulate_read(tpl, default_params(), 3, rng)
        chain = anchor_chain(read, tpl)
        assert len(chain) > 20
        # anchors should deviate from the true mapping only modestly
        rpos = interp_read_pos(chain, np.arange(0, 2001, 100), len(read), 2000)
        assert np.all(np.diff(rpos) >= 0)

    def test_no_anchors_on_unrelated(self):
        rng = np.random.default_rng(10)
        a = rng.integers(0, 4, 500).astype(np.int8)
        b = rng.integers(0, 4, 500).astype(np.int8)
        chain = anchor_chain(a, b)
        assert len(chain) < 5  # random 13-mers rarely collide


class TestDraft:
    def test_orientation_inference(self):
        rng = np.random.default_rng(11)
        tpl = rng.integers(0, 4, 500).astype(np.int8)
        params = default_params()
        fwd = simulate_read(tpl, params, 3, rng)
        rev = dna.revcomp(simulate_read(tpl, params, 3, rng))
        s, _ = infer_orientation(fwd, tpl)
        assert s == 0
        s, _ = infer_orientation(rev, tpl)
        assert s == 1

    @pytest.mark.parametrize("n_passes", [5, 9])
    def test_draft_accuracy(self, n_passes):
        z = simulate_zmw(hole=1, insert_len=800, n_passes=n_passes, snr=9.0)
        res = generate_draft(z.subreads, [True] * n_passes)
        assert res.draft is not None
        assert res.n_mapped >= n_passes - 1
        # inferred strands must match simulated strands (up to global flip)
        flips = [a ^ b for a, b in zip(res.strands, z.strands)]
        assert len(set(flips)) == 1
        # draft accuracy is 'higher than subreads but below 99%'
        # (how-does-ccs-work.md:46-47); polish is the accuracy engine
        target = z.insert if flips[0] == 0 else dna.revcomp(z.insert)
        dist = _edit_distance_dense(res.draft, target)
        limit = 0.07 if n_passes <= 5 else 0.045
        assert dist / 800 < limit, f"draft error {dist}/800 at {n_passes} passes"

    def test_draft_fails_on_garbage(self):
        rng = np.random.default_rng(13)
        subreads = [rng.integers(0, 4, 300).astype(np.int8) for _ in range(4)]
        res = generate_draft(subreads, [True] * 4)
        # unrelated reads: most shouldn't map back to the backbone
        assert res.n_mapped <= 2


class TestDraftCascade:
    def test_chimeric_backbone_fallback(self):
        """A chimeric median read must not poison the draft: the cascade
        retries with neighboring backbone candidates
        (accuracy-vs-passes.md:41-46 fast->robust with fallback)."""
        rng = np.random.default_rng(21)
        insert = rng.integers(0, 4, 500).astype(np.int8)
        params = default_params()
        reads = [simulate_read(insert, params, 4, rng) for _ in range(7)]
        # make the length-median read chimeric: half insert, half junk
        lengths = np.asarray([len(r) for r in reads])
        mid = int(np.argsort(lengths, kind="stable")[len(reads) // 2])
        junk = rng.integers(0, 4, len(reads[mid]) // 2).astype(np.int8)
        reads[mid] = np.concatenate([reads[mid][:len(reads[mid]) // 2], junk])
        res = generate_draft(reads, [True] * 7)
        assert res.draft is not None
        assert res.n_mapped >= 5, res.n_mapped
        dist = _edit_distance_dense(res.draft, insert)
        # draft accuracy envelope at ~6 clean passes (the chimeric-backbone
        # outcome without the cascade was 77 errors / 15%)
        assert dist / 500 < 0.07, dist

    def test_all_good_single_try(self):
        """Happy path still takes the fast route and maps everyone."""
        z = simulate_zmw(hole=3, insert_len=400, n_passes=6, snr=9.0)
        res = generate_draft(z.subreads, [True] * 6)
        assert res.draft is not None and res.n_mapped == 6


class TestInsertionSurgery:
    def test_big_insertion_lane_kept(self):
        """C6 (how-does-ccs-work.md:74-78): a subread carrying a >30 bp
        insertion burst keeps its window lane with the burst excised,
        instead of losing the whole pass for that window."""
        from ccs_tpu.pipeline.windows import build_window_batch
        rng = np.random.default_rng(22)
        draft = rng.integers(0, 4, 120).astype(np.int8)
        # two clean reads + one with a 40bp insertion in the middle
        clean = draft.copy()
        burst_at = 60
        burst = rng.integers(0, 4, 40).astype(np.int8)
        dirty = np.concatenate([draft[:burst_at], burst, draft[burst_at:]])
        T = len(draft)
        rpos_clean = np.arange(T + 1)
        rpos_dirty = np.concatenate([np.arange(burst_at + 1),
                                     np.arange(burst_at + 1, T + 1) + 40])
        batch = build_window_batch(
            draft, [rpos_clean, rpos_clean.copy(), rpos_dirty],
            [clean, clean.copy(), dirty], [True] * 3)
        # the window containing the burst still has all 3 lanes
        for w, win in enumerate(batch.windows):
            assert batch.coverage[w] == 3, (w, batch.coverage[w])
            for lane in range(3):
                rl = batch.rlens[w, lane]
                assert 0 < rl <= win.ext_b - win.ext_a + 40
        # and the dirty lane's burst window slice was cut down to size
        wb = next(w for w, win in enumerate(batch.windows)
                  if win.ext_a <= burst_at < win.ext_b)
        assert batch.rlens[wb, 2] <= (batch.windows[wb].ext_b
                                      - batch.windows[wb].ext_a) + 10

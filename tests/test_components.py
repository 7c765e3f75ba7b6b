"""Tests for sdust, heteroduplex detection, insertion trim, QV binning."""

import numpy as np
import pytest

from ccs_tpu.ops import dna
from ccs_tpu.ops.sdust import (dust_score_profile, has_long_tandem_repeat,
                               low_complexity_intervals,
                               max_tandem_repeat_length)
from ccs_tpu.pipeline.heteroduplex import detect_heteroduplex
from ccs_tpu.pipeline.qvbin import QV_BINS, bin_qvs, qv_to_ascii


class TestSdust:
    def test_random_sequence_clean(self):
        rng = np.random.default_rng(0)
        seq = rng.integers(0, 4, 5000).astype(np.int8)
        assert max_tandem_repeat_length(seq) < 200
        assert not has_long_tandem_repeat(seq, 1000)

    def test_long_tandem_repeat_detected(self):
        rng = np.random.default_rng(1)
        unit = rng.integers(0, 4, 6).astype(np.int8)
        repeat = np.tile(unit, 300)  # 1800 bp tandem repeat
        seq = np.concatenate([rng.integers(0, 4, 1000).astype(np.int8),
                              repeat,
                              rng.integers(0, 4, 1000).astype(np.int8)])
        length = max_tandem_repeat_length(seq)
        assert length >= 1500, length
        assert has_long_tandem_repeat(seq, 1000)

    def test_homopolymer_detected(self):
        rng = np.random.default_rng(2)
        seq = np.concatenate([rng.integers(0, 4, 500).astype(np.int8),
                              np.full(1200, 2, np.int8),
                              rng.integers(0, 4, 500).astype(np.int8)])
        assert has_long_tandem_repeat(seq, 1000)

    def test_short_repeat_not_flagged(self):
        rng = np.random.default_rng(3)
        seq = np.concatenate([rng.integers(0, 4, 2000).astype(np.int8),
                              np.tile(np.asarray([0, 1], np.int8), 50),  # 100bp
                              rng.integers(0, 4, 2000).astype(np.int8)])
        assert not has_long_tandem_repeat(seq, 1000)


class TestHeteroduplex:
    def _rpos(self, T, ins_at=None, ins_len=0):
        """Synthetic monotone read-position array with an optional insertion."""
        rpos = np.arange(T + 1, dtype=np.int64)
        if ins_at is not None:
            rpos[ins_at:] += ins_len
        return rpos

    def test_clean_zmw(self):
        T = 500
        rpos = [self._rpos(T) for _ in range(6)]
        strands = [0, 1, 0, 1, 0, 1]
        assert not detect_heteroduplex(rpos, strands, T)

    def test_single_strand_insertion_flagged(self):
        T = 500
        rpos = []
        strands = []
        for i in range(6):
            strand = i % 2
            if strand == 0:  # all fwd reads have a 30bp insertion at 250
                rpos.append(self._rpos(T, ins_at=250, ins_len=30))
            else:
                rpos.append(self._rpos(T))
            strands.append(strand)
        assert detect_heteroduplex(rpos, strands, T, min_len=21)

    def test_small_heteroduplex_kept(self):
        T = 500
        rpos = []
        strands = []
        for i in range(6):
            strand = i % 2
            rpos.append(self._rpos(T, ins_at=250, ins_len=5 if strand == 0 else 0))
            strands.append(strand)
        assert not detect_heteroduplex(rpos, strands, T, min_len=21)

    def test_both_strand_insertion_not_flagged(self):
        T = 500
        rpos = [self._rpos(T, ins_at=250, ins_len=30) for _ in range(6)]
        strands = [0, 1] * 3
        assert not detect_heteroduplex(rpos, strands, T, min_len=21)


class TestQvBin:
    def test_bin_table(self):
        # exact table from qv-binning.md:23-31
        assert bin_qvs(np.array([0, 6]))[0] == 3 and bin_qvs(np.array([6]))[0] == 3
        assert bin_qvs(np.array([7]))[0] == 10 and bin_qvs(np.array([13]))[0] == 10
        assert bin_qvs(np.array([14]))[0] == 17 and bin_qvs(np.array([19]))[0] == 17
        assert bin_qvs(np.array([20]))[0] == 22 and bin_qvs(np.array([24]))[0] == 22
        assert bin_qvs(np.array([25]))[0] == 27 and bin_qvs(np.array([29]))[0] == 27
        assert bin_qvs(np.array([30]))[0] == 35 and bin_qvs(np.array([39]))[0] == 35
        assert bin_qvs(np.array([40]))[0] == 40 and bin_qvs(np.array([93]))[0] == 40

    def test_ascii(self):
        # documented ASCII codes: $ + 2 7 < D I
        means = np.array([m for _, _, m in QV_BINS])
        assert qv_to_ascii(means) == b"$+27<DI"

    def test_float_input_floor(self):
        assert bin_qvs(np.array([29.9]))[0] == 27
        assert bin_qvs(np.array([95.0]))[0] == 40

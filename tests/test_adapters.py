"""Adapter classifier tests (C15)."""

import numpy as np

from ccs_tpu.ops import dna
from ccs_tpu.pipeline.adapters import (CX_ADAPTER_AFTER_BAD,
                                       CX_ADAPTER_BEFORE_BAD,
                                       FF_ADAPTER_CONCAT,
                                       FF_ADAPTER_PALINDROME,
                                       FF_ADAPTER_RESIDUE, SMRTBELL_ADAPTER,
                                       adapter_counts,
                                       classify_adapter_artifacts)


class TestAdapterCounts:
    def test_all_good(self):
        info = adapter_counts([3, 3, 3, 3], [0, 1, 0, 1])
        np.testing.assert_array_equal(info.ac, [4, 0, 4, 0])
        assert info.ma == 0

    def test_missing_left(self):
        # fwd subreads report ADAPTER_BEFORE_BAD; rev report AFTER_BAD —
        # both map to the molecule's left side
        cx_fwd = 2 | CX_ADAPTER_BEFORE_BAD
        cx_rev = 1 | CX_ADAPTER_AFTER_BAD
        info = adapter_counts([cx_fwd, cx_rev, cx_fwd], [0, 1, 0])
        assert info.ma & 0x1
        assert not (info.ma & 0x2)
        assert info.ac[1] == 3  # missing left count


class TestArtifacts:
    def test_clean_read(self):
        rng = np.random.default_rng(0)
        seq = rng.integers(0, 4, 2000).astype(np.int8)
        assert classify_adapter_artifacts(seq) == 0

    def test_adapter_concatenation(self):
        seq = np.tile(SMRTBELL_ADAPTER, 2)
        assert classify_adapter_artifacts(seq) & FF_ADAPTER_CONCAT

    def test_adapter_residue_near_end(self):
        rng = np.random.default_rng(1)
        seq = np.concatenate([SMRTBELL_ADAPTER,
                              rng.integers(0, 4, 2000).astype(np.int8)])
        assert classify_adapter_artifacts(seq) & FF_ADAPTER_RESIDUE

    def test_adapter_palindrome(self):
        rng = np.random.default_rng(2)
        half = rng.integers(0, 4, 800).astype(np.int8)
        seq = np.concatenate([half, SMRTBELL_ADAPTER, dna.revcomp(half)])
        assert classify_adapter_artifacts(seq) & FF_ADAPTER_PALINDROME

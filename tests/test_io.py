"""Unit tests for the from-scratch BGZF/BAM/pbi codecs (SURVEY.md §4.2(1))."""

import gzip
import io
import os

import numpy as np
import pytest

from ccs_tpu.io import bgzf
from ccs_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter, TagValue, make_ccs_header
from ccs_tpu.io.pbi import build_index_from_records, read_pbi, write_pbi
from ccs_tpu.ops import dna


class TestDna:
    def test_roundtrip(self):
        seq = b"ACGTACGTTTGGCCA"
        codes = dna.encode(seq)
        assert dna.decode(codes) == seq

    def test_encode_n_is_pad(self):
        codes = dna.encode(b"ANT")
        assert codes[0] == 0 and codes[1] == dna.PAD and codes[2] == 3

    def test_revcomp(self):
        assert dna.decode(dna.revcomp(dna.encode(b"ACGGT"))) == b"ACCGT"

    def test_nibble_roundtrip_even_odd(self):
        for seq in (b"ACGT", b"ACGTA"):
            codes = dna.encode(seq)
            packed = dna.pack_nibbles(codes)
            assert len(packed) == (len(seq) + 1) // 2
            np.testing.assert_array_equal(dna.unpack_nibbles(packed, len(seq)), codes)


class TestBgzf:
    def test_roundtrip_small(self):
        data = b"hello bgzf world" * 10
        assert bgzf.decompress_bytes(bgzf.compress_bytes(data)) == data

    def test_roundtrip_multiblock(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 255, size=300_000, dtype=np.uint8).tobytes()
        comp = bgzf.compress_bytes(data)
        assert bgzf.decompress_bytes(comp) == data

    def test_gzip_compatible(self):
        # BGZF streams are valid (multi-member) gzip
        data = b"x" * 100_000
        assert gzip.decompress(bgzf.compress_bytes(data)) == data

    def test_eof_marker(self):
        comp = bgzf.compress_bytes(b"abc")
        assert comp.endswith(bgzf.EOF_MARKER)

    def test_virtual_offset_seek(self):
        buf = io.BytesIO()
        w = bgzf.BgzfWriter(buf)
        offsets = {}
        for i in range(5):
            w.flush()
            offsets[i] = w.tell_virtual
            w.write(f"chunk-{i}:".encode() + b"y" * 50_000)
        w.close()
        r = bgzf.BgzfReader(io.BytesIO(buf.getvalue()))
        for i in (3, 0, 4, 2):
            r.seek_virtual(offsets[i])
            assert r.read(8) == f"chunk-{i}:".encode()


def _mk_record(i, zmw):
    rng = np.random.default_rng(i)
    seq = rng.integers(0, 4, size=100 + i, dtype=np.int8)
    qual = rng.integers(0, 60, size=len(seq)).astype(np.uint8)
    rec = BamRecord(name=f"movie1/{zmw}/{i*100}_{i*100+len(seq)}", seq=seq, qual=qual)
    rec.set_tag("zm", "i", zmw)
    rec.set_tag("qs", "i", i * 100)
    rec.set_tag("qe", "i", i * 100 + len(seq))
    rec.set_tag("cx", "C", 3)
    rec.set_tag("sn", "B", np.array([4.0, 6.5, 5.0, 9.0], dtype=np.float32), "f")
    rec.set_tag("ip", "B", rng.integers(0, 255, size=len(seq)).astype(np.uint8), "C")
    rec.set_tag("RG", "Z", b"deadbeef")
    return rec


class TestBam:
    def test_record_roundtrip(self):
        rec = _mk_record(1, 42)
        body = rec.encode()[4:]
        back = BamRecord.decode(body)
        assert back.name == rec.name
        np.testing.assert_array_equal(back.seq, rec.seq)
        np.testing.assert_array_equal(back.qual, rec.qual)
        assert back.tag("zm") == 42
        assert back.tag("cx") == 3
        np.testing.assert_allclose(back.tag("sn"), [4.0, 6.5, 5.0, 9.0])
        assert back.tags["sn"].subtype == "f"
        assert back.tag("RG") == b"deadbeef"

    def test_file_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.bam")
        header = make_ccs_header("movie1", [{"ID": "deadbeef", "PL": "PACBIO", "PU": "movie1",
                                            "DS": "READTYPE=CCS;BINDINGKIT=101-894-200"}])
        recs = [_mk_record(i, i // 2) for i in range(6)]
        with BamWriter(path, header) as w:
            for rec in recs:
                w.write_record(rec)
            voffs = list(w.voffsets)
        with BamReader(path) as r:
            assert r.header.movie_name() == "movie1"
            assert r.header.chemistry()["BINDINGKIT"] == "101-894-200"
            got = list(r)
        assert len(got) == 6
        for a, b in zip(recs, got):
            assert a.name == b.name
            np.testing.assert_array_equal(a.seq, b.seq)
        # seek to 4th record by virtual offset
        with BamReader(path) as r:
            r.seek_virtual(voffs[3])
            rec = r.read_record()
            assert rec.name == recs[3].name

    def test_missing_qual(self):
        rec = BamRecord(name="x/1/0_4", seq=dna.encode(b"ACGT"), qual=None)
        back = BamRecord.decode(rec.encode()[4:])
        assert back.qual is None


class TestPbi:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.bam.pbi")
        recs = [_mk_record(i, i // 2) for i in range(6)]
        voffs = [100 + 37 * i for i in range(6)]
        idx = build_index_from_records(recs, voffs)
        write_pbi(path, idx)
        back = read_pbi(path)
        assert back.n_reads == 6
        np.testing.assert_array_equal(back.hole_number, [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(back.file_offset, voffs)
        np.testing.assert_array_equal(back.unique_zmws(), [0, 1, 2])

    def test_chunk_ranges(self):
        recs = [_mk_record(i, i) for i in range(10)]
        idx = build_index_from_records(recs, list(range(10)))
        ranges = idx.zmw_chunk_ranges(3)
        assert ranges == [(0, 4), (4, 7), (7, 10)]
        assert ranges[-1][1] == 10

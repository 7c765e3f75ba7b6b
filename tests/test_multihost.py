"""Multi-host scale-out (parallel/multihost.py): N cooperating processes
over per-host chunks must merge to output identical to a single run —
the reference's --chunk + pbmerge contract
(/root/reference/docs/faq/parallelize.md:7-29)."""

import gzip
import json
import os

import numpy as np
import pytest

from ccs_tpu.cli import run
from ccs_tpu.io.bam import BamReader
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam


@pytest.fixture(scope="module")
def subreads_bam(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "in.subreads.bam")
    zmws = [simulate_zmw(hole=h, insert_len=220, n_passes=8, snr=9.0)
            for h in range(8)]
    write_subreads_bam(path, zmws)
    return path


def _records(path):
    with BamReader(path) as r:
        return [(rec.name, rec.seq.tobytes(), rec.qual.tobytes(),
                 rec.tag("rq"), rec.tag("np")) for rec in r]


class TestMultihost:
    def test_two_hosts_merge_equals_single(self, subreads_bam, tmp_path):
        single = str(tmp_path / "single.bam")
        assert run([subreads_bam, single]) == 0

        merged = str(tmp_path / "merged.bam")
        # sequential hosts (shared filesystem): host 1 first, then host 0
        # which finds the sentinel and merges. Order is irrelevant in
        # production (host 0 polls).
        assert run([subreads_bam, merged, "--tpu-num-hosts", "2",
                    "--tpu-host-id", "1"]) == 0
        assert run([subreads_bam, merged, "--tpu-num-hosts", "2",
                    "--tpu-host-id", "0"]) == 0

        assert _records(merged) == _records(single)
        # merged .pbi exists and matches
        from ccs_tpu.io.pbi import read_pbi
        assert read_pbi(merged + ".pbi").n_reads == len(_records(merged))
        # reports merge to the same counts
        rep_s = open(str(tmp_path / "single.ccs_report.txt")).read()
        rep_m = open(str(tmp_path / "merged.ccs_report.txt")).read()
        assert rep_m == rep_s
        with gzip.open(str(tmp_path / "merged.zmw_metrics.json.gz")) as fh:
            metrics = json.load(fh)
        assert len(metrics["zmws"]) == 8
        # host temps cleaned up
        left = [p for p in os.listdir(tmp_path) if ".host" in p]
        assert not left, left

    @pytest.mark.slow
    def test_two_process_distributed(self, subreads_bam, tmp_path):
        """Two REAL processes + jax.distributed coordinator (VERDICT r3
        missing 7): merged output identical to a single run, cross-host
        psum exact past 2^24."""
        import socket
        import subprocess
        import sys

        single = str(tmp_path / "single.bam")
        assert run([subreads_bam, single]) == 0

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            coord = f"127.0.0.1:{s.getsockname()[1]}"
        merged = str(tmp_path / "merged2p.bam")
        worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord, subreads_bam,
             merged],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.dirname(worker)))
            for i in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("2-process multihost run timed out")
            assert p.returncode == 0, err[-3000:]
            outs.append(out)
        # exact int64 psum: (2^40+0) + (2^40+1)
        for out in outs:
            assert f"PSUM {2 ** 41 + 1} 1" in out, out
        assert _records(merged) == _records(single)

    def test_host_id_validation(self, subreads_bam, tmp_path):
        with pytest.raises(SystemExit):
            run([subreads_bam, str(tmp_path / "x.bam"),
                 "--tpu-num-hosts", "2", "--tpu-host-id", "5"])
        with pytest.raises(SystemExit):
            run([subreads_bam, str(tmp_path / "x.bam"),
                 "--tpu-num-hosts", "2", "--tpu-host-id", "0",
                 "--chunk", "1/2"])

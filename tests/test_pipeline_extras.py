"""Tests for QV storage, FASTQ ingestion, contig analysis, planner
manifest, and the full pipeline driver (resume included)."""
import json
import os

import numpy as np
import pytest

from damar_tpu.formats import dazzdb, qv
from damar_tpu.formats.fasta import decode_seq, read_fastq


class TestQV:
    def test_roundtrip(self, tmp_path, rng):
        streams = [{"ins_qv": rng.integers(0, 40, 200).astype(np.uint8),
                    "sub_qv": rng.integers(0, 20, 200).astype(np.uint8)}
                   for _ in range(4)]
        dbp = str(tmp_path / "Q.db")
        open(dbp, "w").write("files =         0\n")
        qv.write_qvs(dbp, streams)
        back = qv.read_qvs(dbp)
        assert len(back) == 4
        for a, b in zip(streams, back):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
            assert "del_qv" not in b

    def test_fastq_ingest_stores_qvs(self, tmp_path, rng):
        fq = str(tmp_path / "r.fastq")
        seqs, quals = [], []
        with open(fq, "w") as f:
            for i in range(3):
                s = rng.integers(0, 4, 150).astype(np.uint8)
                q = rng.integers(0, 41, 150)
                seqs.append(s)
                quals.append(q)
                f.write(f"@r{i}\n{decode_seq(s)}\n+\n"
                        + "".join(chr(33 + int(x)) for x in q) + "\n")
        dbp = str(tmp_path / "F.db")
        db = dazzdb.create_db(dbp, [fq])
        assert db.ureads == 3
        np.testing.assert_array_equal(db.read_seq(1), seqs[1])
        st = qv.read_qvs(dbp)
        np.testing.assert_array_equal(st[2]["ins_qv"], quals[2])


class TestContigAnalysis:
    def test_assembly_stats(self):
        from damar_tpu.pipeline.contigs import assembly_stats
        st = assembly_stats([50, 30, 20], genome_size=90)
        assert st["n50"] == 50 and st["l50"] == 1
        assert st["ng50"] == 50 and st["total_bp"] == 100
        st2 = assembly_stats([50, 30, 20], genome_size=160)
        assert st2["ng50"] == 30  # need 80: 50+30 reaches it

    def test_coverage_profile(self):
        from damar_tpu.pipeline.contigs import coverage_profile
        seqs = {0: np.zeros(400, np.uint8), 1: np.zeros(400, np.uint8)}
        layout = [(0, 0, 0), (1, 0, 200)]
        cov = coverage_profile(600, layout, lambda r, d: seqs[r],
                               bin_size=100)
        assert cov.tolist() == [1, 1, 2, 2, 1, 1]


class TestManifest:
    def test_resume_skips_done(self, tmp_path):
        from damar_tpu.pipeline.planner import Manifest
        p = str(tmp_path / "m.jsonl")
        m = Manifest(p)
        assert not m.is_done("a")
        m.mark("a", novl=5)
        m2 = Manifest(p)   # reload from disk
        assert m2.is_done("a") and m2.done["a"]["novl"] == 5

    def test_plan_and_render(self):
        from damar_tpu.pipeline.planner import (plan_block_pairs,
                                                render_script)
        jobs = plan_block_pairs("E", 3)
        kinds = [j.kind for j in jobs]
        assert kinds.count("overlap") == 6  # 3*(3+1)/2
        assert kinds.count("merge") == 3
        script = render_script(jobs)
        assert "daligner E 1 2" in script and "lamerge" in script


class TestFullPipeline:
    def test_tiny_genome_end_to_end(self, tmp_path):
        from damar_tpu.core.config import (OverlapConfig, PipelineConfig)
        from damar_tpu.pipeline.run import run_pipeline
        from damar_tpu.utils.sim import (make_genome, sample_reads,
                                         write_sim_fasta)
        g = make_genome(12_000, seed=81)
        sim = sample_reads(g, coverage=10, mean_len=2500, err=0.13,
                           seed=82)
        fq = str(tmp_path / "reads.fasta")
        write_sim_fasta(fq, sim)
        cfg = PipelineConfig(
            overlap=OverlapConfig(seed_batch=512), block_mb=1,
            min_read_len=500)
        rep = run_pipeline(fq, str(tmp_path / "asm"), cfg,
                           polish=False, verbose=False)
        a = rep["phases"]["assemble"]
        assert a["contigs"] >= 1
        assert a["lengths"][0] > 0.8 * len(g)
        # resume: a second run must skip both overlap rounds
        rep2 = run_pipeline(fq, str(tmp_path / "asm"), cfg,
                            polish=False, verbose=False)
        assert rep2["phases"]["overlap1"]["skipped"] == \
            rep2["phases"]["overlap1"]["skipped"] + \
            rep2["phases"]["overlap1"]["pairs"]
        assert os.path.exists(str(tmp_path / "asm" / "report.json"))


class TestMultiRoundRepmask:
    def test_plan_masking_rounds(self):
        """HPC.REPmask parity: >4 blocks plan 3 coarse-to-fine repeat
        rounds; each round's overlap jobs soft-mask with the previous
        rounds' tracks and feed a per-block repmask + track merge."""
        from damar_tpu.pipeline.planner import plan_masking
        jobs = plan_masking("E", 6)
        names = {j.name for j in jobs}
        assert {"rep1.merge", "rep2.merge", "rep3.merge"} <= names
        r2 = [j for j in jobs if j.name.startswith("rep2.ovl.")]
        assert r2, "round 2 has no overlap jobs"
        assert all("rep1" in j.args["masks"] for j in r2)
        assert all(j.deps == ["rep1.merge"] for j in r2)
        r3 = [j for j in jobs if j.name.startswith("rep3.ovl.")]
        # final round sweeps all blocks
        assert len(r3) == 6 * 7 // 2
        assert all("rep2" in j.args["masks"] for j in r3)
        # small DBs degrade to fewer rounds
        j1 = plan_masking("E", 1)
        assert any(j.name == "rep1.merge" or j.name == "rep.merge"
                   for j in j1)

    def test_render_script_includes_mask_rounds(self):
        from damar_tpu.pipeline.planner import (plan_block_pairs,
                                                render_script)
        jobs = plan_block_pairs("E", 6)
        s = render_script(jobs, db_root="E", nblocks=6)
        assert "rep" in s and "daligner" in s


class TestQVHuffman:
    """The DQH1 Huffman codec (QV.c coding family — upstream
    DAZZ_DB/db/QV.c ⟨VERIFY⟩): per-stream canonical Huffman + delQV
    RLE, encode -> decode bit-exact."""

    def test_full_five_stream_roundtrip(self, rng):
        from damar_tpu.formats.qv_huff import encode_qvs, decode_qvs
        reads = []
        for i in range(6):
            n = int(rng.integers(50, 400))
            # delQV: heavily modal (RLE target) like real PacBio delQVs
            dq = np.where(rng.random(n) < 0.8, 22,
                          rng.integers(0, 45, n)).astype(np.uint8)
            reads.append({
                "del_qv": dq,
                "del_char": rng.integers(97, 123, n).astype(np.uint8),
                "ins_qv": rng.integers(0, 45, n).astype(np.uint8),
                "mrg_qv": rng.integers(0, 45, n).astype(np.uint8),
                "sub_qv": rng.integers(0, 45, n).astype(np.uint8)})
        blob = encode_qvs(reads)
        back = decode_qvs(blob)
        assert len(back) == len(reads)
        for a, b in zip(reads, back):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        # the modal delQV must compress well below raw size
        raw = sum(sum(len(v) for v in st.values()) for st in reads)
        assert len(blob) < raw

    def test_missing_and_empty_streams(self, rng):
        from damar_tpu.formats.qv_huff import encode_qvs, decode_qvs
        reads = [{"ins_qv": rng.integers(0, 40, 100).astype(np.uint8)},
                 {"ins_qv": np.zeros(0, np.uint8)},
                 {"ins_qv": rng.integers(0, 40, 77).astype(np.uint8),
                  "sub_qv": rng.integers(0, 10, 77).astype(np.uint8)}]
        back = decode_qvs(encode_qvs(reads))
        np.testing.assert_array_equal(back[0]["ins_qv"],
                                      reads[0]["ins_qv"])
        assert len(back[1].get("ins_qv", [])) == 0
        np.testing.assert_array_equal(back[2]["sub_qv"],
                                      reads[2]["sub_qv"])
        assert "del_qv" not in back[0]

    def test_single_symbol_stream(self):
        from damar_tpu.formats.qv_huff import encode_qvs, decode_qvs
        reads = [{"ins_qv": np.full(300, 7, np.uint8)}]
        back = decode_qvs(encode_qvs(reads))
        np.testing.assert_array_equal(back[0]["ins_qv"],
                                      reads[0]["ins_qv"])

    def test_qvs_file_dispatches_on_magic(self, tmp_path, rng):
        # write_qvs now emits DQH1; read_qvs reads it AND legacy DQV1
        streams = [{"ins_qv": rng.integers(0, 40, 120).astype(np.uint8),
                    "del_qv": np.where(rng.random(120) < 0.7, 9,
                                       rng.integers(0, 30, 120)
                                       ).astype(np.uint8),
                    "del_char": rng.integers(97, 101, 120).astype(np.uint8),
                    "mrg_qv": rng.integers(0, 30, 120).astype(np.uint8),
                    "sub_qv": rng.integers(0, 30, 120).astype(np.uint8)}
                   for _ in range(3)]
        dbp = str(tmp_path / "H.db")
        open(dbp, "w").write("files =         0\n")
        qv.write_qvs(dbp, streams)
        raw = open(qv.qvs_path(dbp), "rb").read()
        from damar_tpu.formats.qv_huff import MAGIC as HMAGIC
        assert int(np.frombuffer(raw, "<u4", 1, 0)[0]) == HMAGIC
        back = qv.read_qvs(dbp)
        for a, b in zip(streams, back):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

"""End-to-end overlap detection test (BASELINE config 1 equivalent:
single-block self-comparison on simulated reads with ground truth)."""
import numpy as np
import pytest

from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig
from damar_tpu.formats.las import check_las, merge_las, cat_las, LasFile, write_las, read_las
from damar_tpu.formats.oflags import OVL_COMP
from damar_tpu.pipeline.overlap import overlap_block_pair

CFG = OverlapConfig(seed_batch=512)


@pytest.fixture(scope="module")
def overlap_result(small_sim):
    blk = block_from_reads(small_sim.reads)
    las_a, las_b, stats = overlap_block_pair(
        blk, blk, CFG, self_block=True,
        hit_cap=1 << 20, seed_cap=1 << 15)
    return small_sim, blk, las_a, las_b, stats


class TestOverlapE2E:
    def test_las_structurally_clean(self, overlap_result):
        sim, blk, las_a, las_b, stats = overlap_result
        rlen = np.array([len(r) for r in sim.reads])
        assert las_a.novl > 0
        errs = check_las(las_a, rlen)
        assert errs == [], errs[:5]
        errs_b = check_las(las_b, rlen)
        assert errs_b == [], errs_b[:5]

    def test_recall_and_precision(self, overlap_result):
        sim, blk, las_a, las_b, stats = overlap_result
        found = {(o.aread, o.bread, bool(o.flags & OVL_COMP))
                 for o in las_a.overlaps}
        n = len(sim.reads)
        n_true = n_found = 0
        for a in range(n):
            for b in range(a + 1, n):
                if sim.true_overlap(a, b, 1500):
                    comp = sim.strand[a] != sim.strand[b]
                    n_true += 1
                    if (a, b, comp) in found:
                        n_found += 1
        recall = n_found / max(n_true, 1)
        assert recall >= 0.9, f"recall {recall:.3f} ({n_found}/{n_true})"
        # precision: every reported overlap >= min_len must be true
        n_bad = sum(
            1 for (a, b, c) in found
            if not sim.true_overlap(a, b, 300))
        assert n_bad / max(len(found), 1) <= 0.05, \
            f"{n_bad}/{len(found)} spurious overlaps"

    def test_mirror_symmetry(self, overlap_result):
        sim, blk, las_a, las_b, stats = overlap_result
        # every (a,b) record has a (b,a) mirror with reflected coords
        prim = {}
        for o in las_a.overlaps:
            prim[(o.aread, o.bread, o.flags & OVL_COMP,
                  o.abpos, o.aepos)] = o
        rlen = np.array([len(r) for r in sim.reads])
        n_checked = 0
        for m in las_b.overlaps:
            comp = m.flags & OVL_COMP
            if comp:
                bl = rlen[m.aread]
                al = rlen[m.bread]
                key = (m.bread, m.aread, comp,
                       al - m.bepos, al - m.bbpos)
            else:
                key = (m.bread, m.aread, comp, m.bbpos, m.bepos)
            if key in prim:
                n_checked += 1
        # symmetry is an INVARIANT (reference parity): every record
        # has its mirror — trace-retry drops are symmetric by uid
        assert las_a.novl == las_b.novl
        assert n_checked == las_b.novl, \
            f"{n_checked}/{las_b.novl} mirrored"

    def test_diff_rates_sane(self, overlap_result):
        sim, blk, las_a, las_b, stats = overlap_result
        rates = [o.diffs / max(o.aepos - o.abpos, 1)
                 for o in las_a.overlaps]
        med = float(np.median(rates))
        # 14% per-read error -> ~25% pair rate
        assert 0.15 < med < 0.35, med

    def test_roundtrip_through_disk(self, overlap_result, tmp_path):
        sim, blk, las_a, las_b, stats = overlap_result
        p1 = str(tmp_path / "a.las")
        p2 = str(tmp_path / "b.las")
        pm = str(tmp_path / "m.las")
        write_las(p1, las_a)
        write_las(p2, las_b)
        merge_las([p1, p2], pm)
        m = read_las(pm)
        assert m.novl == las_a.novl + las_b.novl
        rlen = np.array([len(r) for r in sim.reads])
        assert check_las(m, rlen) == []


class TestIdentityOption:
    def test_identity_reports_self_overlaps(self):
        """OverlapConfig.identity (daligner -I): tandem-bearing reads
        gain aread==bread records; default drops them."""
        import numpy as np
        from damar_tpu.utils.sim import make_genome, mutate
        rng = np.random.default_rng(3)
        unit = rng.integers(0, 4, 900).astype(np.uint8)
        tandem = np.concatenate([mutate(unit, 0.05, rng)
                                 for _ in range(3)])  # 3 copies
        other = [rng.integers(0, 4, 2000).astype(np.uint8)
                 for _ in range(3)]
        reads = [tandem] + other
        blk = block_from_reads(reads)
        for ident, expect_self in ((False, False), (True, True)):
            cfg = OverlapConfig(min_len=500, identity=ident,
                                seed_batch=128)
            la, lb, _ = overlap_block_pair(
                blk, blk, cfg, self_block=True,
                hit_cap=1 << 18, seed_cap=1 << 12)
            h = la.columns.headers if la.columns is not None else None
            selfs = (int((h[:, 7] == h[:, 8]).sum())
                     if h is not None and len(h) else 0)
            if expect_self:
                assert selfs > 0, "identity=True found no self-overlaps"
            else:
                assert selfs == 0, f"{selfs} self records at default"

"""Scrubbing tests (BASELINE config 4: patch/trim/split from piles).

The central property (the lineage's signature): patching reads from
their alignment piles must REDUCE their error rate vs the true genome.
"""
import numpy as np
import pytest

from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig, ScrubConfig
from damar_tpu.formats.las import LasFile, Overlap
from damar_tpu.formats.oflags import OVL_COMP, OVL_DISCARD, OVL_STITCH
from damar_tpu.pipeline import scrub
from damar_tpu.pipeline.overlap import overlap_block_pair

CFG = OverlapConfig(seed_batch=512)
SCFG = ScrubConfig()


@pytest.fixture(scope="module")
def pile_result(small_sim):
    from damar_tpu.formats.las import cat_las  # noqa
    blk = block_from_reads(small_sim.reads)
    las_a, las_b, stats = overlap_block_pair(
        blk, blk, CFG, self_block=True,
        hit_cap=1 << 20, seed_cap=1 << 15)
    full = LasFile(tspace=CFG.tspace,
                   overlaps=las_a.overlaps + las_b.overlaps)
    full.sort()
    rlen_of = {i: len(r) for i, r in enumerate(small_sim.reads)}
    return small_sim, blk, full, rlen_of


def lev(a, b):
    prev = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = np.empty(len(b) + 1, int)
        cur[0] = i
        np_min = np.minimum
        # vectorized row update (sub/del), then fix-up insertions
        sub = prev[:-1] + (b != a[i - 1])
        cur[1:] = np_min(prev[1:] + 1, sub)
        for j in range(1, len(b) + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return prev[-1]


class TestQTrim:
    def test_quality_reflects_coverage(self, pile_result):
        sim, blk, las, rlen_of = pile_result
        qual, trim = scrub.q_and_trim(las, rlen_of, SCFG)
        covered = sum((q < scrub.Q_NOCOV).sum() for q in qual.values())
        total = sum(len(q) for q in qual.values())
        assert covered / total > 0.8, f"only {covered}/{total} covered"
        # median segment quality should reflect the ~25% pair error
        allq = np.concatenate([q[q < scrub.Q_NOCOV]
                               for q in qual.values()])
        med = np.median(allq)
        assert 10 < med < 40, med

    def test_trim_within_read(self, pile_result):
        sim, blk, las, rlen_of = pile_result
        qual, trim = scrub.q_and_trim(las, rlen_of, SCFG)
        for aread, (tb, te) in trim.items():
            assert 0 <= tb <= te <= rlen_of[aread]


class TestStitch:
    def test_stitch_merges_split_alignment(self):
        t = np.array([[5, 100]] * 5, np.int32)
        o1 = Overlap(0, 1, 0, 0, 500, 0, 500, 25, t.copy())
        o2 = Overlap(0, 1, 0, 520, 1020, 515, 1015, 25, t.copy())
        far = Overlap(0, 1, 0, 3000, 3500, 2990, 3490, 25, t.copy())
        las = LasFile(100, [o1, o2, far])
        stitched, needs = scrub.stitch_las(las, fuzz=100)
        assert stitched.novl == 2
        # positive-gap junctions are BRIDGED from the fragment traces
        # (no DP retrace needed)
        assert len(needs) == 0
        merged = [o for o in stitched.overlaps if o.flags & OVL_STITCH]
        assert len(merged) == 1
        m = merged[0]
        assert (m.abpos, m.aepos, m.bbpos, m.bepos) == (0, 1020, 0, 1015)
        assert m.diffs == 25 + 25 + 20 + 15   # chain diffs + gap penalty
        # bridged trace is structurally consistent: full segment grid,
        # b-spans summing to the merged b-extent, diffs to the header
        from damar_tpu.formats.las import n_segments
        assert len(m.trace) == n_segments(0, 1020, 100)
        assert int(m.trace[:, 1].sum()) == 1015
        assert int(m.trace[:, 0].sum()) == m.diffs
        assert (m.trace >= 0).all()

    def test_stitch_negative_gap_needs_retrace(self):
        t = np.array([[5, 100]] * 5, np.int32)
        o1 = Overlap(0, 1, 0, 0, 500, 0, 500, 25, t.copy())
        o2 = Overlap(0, 1, 0, 480, 980, 515, 1015, 25, t.copy())
        las = LasFile(100, [o1, o2])
        stitched, needs = scrub.stitch_las(las, fuzz=100)
        assert stitched.novl == 1
        assert len(needs) == 1           # overlapping fragments: DP


class TestFix:
    def test_patching_restores_corrupted_segments(self):
        """Plant severe local corruption (quality dropouts) in a few
        reads; the stitch -> retrace -> q -> fix pipeline must restore
        those regions to near-normal identity, the lineage's core
        'patch' capability (SURVEY.md §2.6 LAfix).

        Own dataset at 14x: patchability of a specific window depends
        on its pile depth, so the shared 12x fixture leaves the planted
        windows of some rng streams too thin to both survive splitting
        and win the vote."""
        from damar_tpu.pipeline.overlap import retrace_rows
        from damar_tpu.utils.sim import make_genome, sample_reads
        import damar_tpu.formats.fasta as F
        g = make_genome(50_000, seed=7)
        sim = sample_reads(g, coverage=14.0, mean_len=4000, err=0.13,
                           seed=8)
        rng = np.random.default_rng(77)
        reads = [r.copy() for r in sim.reads]
        corrupted = {}
        for i in range(len(reads)):
            if len(reads[i]) >= 4000 and len(corrupted) < 4:
                lo = 1500
                hi = 1700
                reads[i][lo:hi] = rng.integers(0, 4, hi - lo)
                corrupted[i] = (lo, hi)
        assert len(corrupted) >= 3
        blk = block_from_reads(reads)
        las_a, las_b, _ = overlap_block_pair(
            blk, blk, CFG, self_block=True,
            hit_cap=1 << 20, seed_cap=1 << 15)
        las = LasFile(CFG.tspace, las_a.overlaps + las_b.overlaps)
        las.sort()
        rlen_of = {i: len(r) for i, r in enumerate(reads)}
        # stitch across the corruption (bridged traces; only
        # negative-gap chains need the DP retrace)
        stitched, needs = scrub.stitch_las(las, fuzz=300)
        h = stitched.columns.headers
        n_merged = int(((h[:, 6].view(np.uint32) & OVL_STITCH) != 0)
                       .sum())
        assert n_merged, "no stitched records (corruption did not split?)"
        if len(needs):
            retrace_rows(stitched, needs, blk, blk, CFG)
        qual, trim = scrub.q_and_trim(stitched, rlen_of, SCFG)

        def seqs_of(j, comp):
            return F.revcomp(reads[j]) if comp else reads[j]

        patched = scrub.fix_reads(stitched, seqs_of, rlen_of, qual,
                                  SCFG, reads_to_fix=sorted(corrupted))
        by_read = {}
        for p in patched:
            by_read.setdefault(p.src_read, []).append(p)
        restored = 0
        checked = 0
        for i, (lo, hi) in corrupted.items():
            parts = by_read.get(i, [])
            # the read must NOT have been split at the corruption
            span = [p for p in parts
                    if p.src_interval[0] <= lo and hi <= p.src_interval[1]]
            if not span:
                continue
            p = span[0]
            checked += 1
            # compare the corrupted window against the true genome
            gg = np.concatenate([sim.genome, sim.genome])
            truth_full = gg[sim.start[i]:sim.end[i]]
            if sim.strand[i]:
                truth_full = F.revcomp(truth_full)
            L = len(reads[i])
            w_lo, w_hi = lo - 100, hi + 100
            glo = int(w_lo / L * len(truth_full))
            ghi = int(w_hi / L * len(truth_full))
            truth = truth_full[max(0, glo - 60):ghi + 60]
            off = p.src_interval[0]
            d_before = lev(reads[i][w_lo:w_hi], truth)
            d_after = lev(p.seq[w_lo - off:w_hi - off], truth)
            assert d_after < d_before * 0.8, \
                f"read {i}: {d_before} -> {d_after}"
            restored += 1
        assert checked >= 2 and restored == checked, \
            f"{restored}/{checked} restored ({len(corrupted)} planted)"


class TestGapFilter:
    def test_gap_detects_chimera(self):
        # pile covering [0,1000) and [1200,2200) but not the middle
        ovls = []
        t = np.array([[5, 100]] * 10, np.int32)
        for b in range(1, 5):
            ovls.append(Overlap(0, b, 0, 0, 1000, 0, 1000, 50, t))
            ovls.append(Overlap(0, b + 10, 0, 1200, 2200, 0, 1000, 50, t))
        las = LasFile(100, ovls)
        br = scrub.gap_breaks(las, {0: 2200}, SCFG)
        assert 0 in br and 1000 <= br[0][0] <= 1200

    def test_filter_classification(self):
        t0 = np.zeros((0, 2), np.int32)
        rlen = {0: 2000, 1: 2000, 2: 2000}
        dove = Overlap(0, 1, 0, 1000, 2000, 0, 1000, 10, t0)
        local = Overlap(0, 2, 0, 500, 1500, 500, 1500, 10, t0)
        las = LasFile(100, [dove, local])
        # build self-consistent traces so check passes elsewhere
        f = scrub.filter_las(las, rlen, SCFG)
        kinds = {(o.aread, o.bread): o.flags for o in f.overlaps}
        assert not (kinds[(0, 1)] & OVL_DISCARD)
        assert kinds[(0, 2)] & OVL_DISCARD


class TestGapTrimClip:
    def test_gap_trim_keeps_longest_side_snapped(self):
        out = scrub.gap_trim({0: (0, 2200)}, {0: [950]}, ts=100)
        assert out[0] == (1000, 2200)   # ceil-snapped interior cut
        out = scrub.gap_trim({0: (0, 2200)}, {0: [1450]}, ts=100)
        assert out[0] == (0, 1400)      # floor-snapped interior cut
        # no breaks inside trim: unchanged
        out = scrub.gap_trim({0: (300, 2200)}, {0: [100]}, ts=100)
        assert out[0] == (300, 2200)

    def test_clip_to_trim_segments(self):
        t = np.array([[5, 100]] * 10, np.int32)
        o = Overlap(0, 1, 0, 0, 1000, 0, 1000, 50, t)
        las = LasFile(100, [o])
        rlen = {0: 2200, 1: 1000}
        clipped = scrub.clip_las_to_trim(las, rlen,
                                         {0: (300, 2200), 1: (0, 1000)})
        [c] = clipped.overlaps
        assert (c.abpos, c.aepos) == (0, 700)    # 300..1000 shifted
        assert (c.bbpos, c.bepos) == (300, 1000)
        assert c.diffs == 35 and len(c.trace) == 7
        # check_las invariants hold in the trimmed universe
        from damar_tpu.formats.las import check_las
        trlen = np.array([1900, 1000], np.int64)
        errs = check_las(clipped, trlen, trlen)
        assert not errs, errs

    def test_clip_comp_record_uses_flipped_window(self):
        t = np.array([[5, 100]] * 10, np.int32)
        o = Overlap(0, 1, OVL_COMP, 0, 1000, 0, 1000, 50, t)
        las = LasFile(100, [o])
        rlen = {0: 1000, 1: 1200}
        # b trim (0, 1100): in the comp record's flipped frame the
        # window is [1200-1100, 1200) = [100, 1200) -> first segment
        # (b in [0,100)) is clipped
        clipped = scrub.clip_las_to_trim(las, rlen,
                                         {0: (0, 1000), 1: (0, 1100)})
        [c] = clipped.overlaps
        assert (c.abpos, c.aepos) == (100, 1000)
        assert (c.bbpos, c.bepos) == (0, 900)    # shifted by wb0=100
        assert len(c.trace) == 9

    def test_clip_drops_outside_and_empty_trim(self):
        t = np.array([[5, 100]] * 5, np.int32)
        o1 = Overlap(0, 1, 0, 0, 500, 0, 500, 25, t)
        o2 = Overlap(2, 1, 0, 0, 500, 0, 500, 25, t)
        las = LasFile(100, [o1, o2])
        rlen = {0: 500, 1: 500, 2: 500}
        clipped = scrub.clip_las_to_trim(
            las, rlen, {0: (0, 0), 1: (0, 500), 2: (0, 500)})
        assert clipped.novl == 1
        assert clipped.overlaps[0].aread == 2


class TestFilterSymmetry:
    """LAfilter mirror-symmetry contract (upstream MARVEL
    scrub/LAfilter.c OVL_SYMDISCARD ⟨VERIFY⟩): a record and its mirror
    both survive or neither — asserted pair-by-pair on real overlap
    output with an asymmetric rule provoked."""

    def _las_and_lens(self):
        from damar_tpu.utils.sim import make_genome, sample_reads
        from damar_tpu.formats.las import LasFile
        g = make_genome(60_000, seed=71)
        sim = sample_reads(g, coverage=10, mean_len=3000, err=0.12,
                           seed=72)
        blk = block_from_reads(sim.reads)
        cfg = OverlapConfig()
        la, lb, _ = overlap_block_pair(blk, blk, cfg, self_block=True,
                                       emit_mirrors=True)
        las = LasFile.concat([la, lb])
        las.sort()
        rlen = {i: len(r) for i, r in enumerate(sim.reads)}
        return las, rlen

    @staticmethod
    def _pair_key(h, rlen):
        import numpy as np
        from damar_tpu.formats.las import (H_ABPOS, H_AEPOS, H_AREAD,
                                           H_BBPOS, H_BEPOS, H_BREAD,
                                           H_FLAGS)
        a, b = int(h[H_AREAD]), int(h[H_BREAD])
        abp, aep = int(h[H_ABPOS]), int(h[H_AEPOS])
        bbp, bep = int(h[H_BBPOS]), int(h[H_BEPOS])
        comp = bool(h[H_FLAGS] & OVL_COMP)
        al, bl = rlen[a], rlen[b]
        own = (a, b, abp, aep, bbp, bep)
        if comp:
            mir = (b, a, bl - bep, bl - bbp, al - aep, al - abp)
        else:
            mir = (b, a, bbp, bep, abp, aep)
        return (min(own, mir), comp)

    def test_repeat_rule_discards_are_mirror_consistent(self):
        import numpy as np
        from damar_tpu.formats.las import H_AREAD, H_FLAGS
        from damar_tpu.formats.oflags import OVL_SYMDISCARD
        las, rlen = self._las_and_lens()
        # repeat intervals on a FEW reads only: the A-side unique-
        # anchor rule then fires asymmetrically by construction
        rep = {i: np.array([0, rlen[i]], np.int32) for i in
               list(rlen)[:5]}
        cfg = ScrubConfig(anchor_min=10**9)  # every covered rec fails
        out = scrub.filter_las(las, rlen, cfg, rep)
        h = out.columns.headers
        state = {}
        n_sym = 0
        for row in h:
            k = self._pair_key(row, rlen)
            d = bool(row[H_FLAGS] & OVL_DISCARD)
            if int(row[H_FLAGS]) & OVL_SYMDISCARD:
                n_sym += 1
                assert d, "SYMDISCARD without DISCARD"
            if k in state:
                assert state[k] == d, f"asymmetric discard at {k}"
            else:
                state[k] = d
        assert n_sym > 0, "no propagated discards despite asymmetric rule"
        assert any(state.values()), "repeat rule discarded nothing"
        assert not all(state.values()), "everything discarded"

    def test_best_n_per_end_caps_dovetails(self):
        import numpy as np
        from damar_tpu.formats.las import H_FLAGS
        las, rlen = self._las_and_lens()
        base = scrub.filter_las(las, rlen, ScrubConfig())
        capped = scrub.filter_las(las, rlen, ScrubConfig(filter_best_n=2))

        def kept(f):
            h = f.columns.headers
            return int(((h[:, H_FLAGS] & OVL_DISCARD) == 0).sum())
        assert kept(capped) < kept(base), "best-n removed nothing"
        # mirror consistency after best-n
        state = {}
        for row in capped.columns.headers:
            k = self._pair_key(row, rlen)
            d = bool(row[H_FLAGS] & OVL_DISCARD)
            if k in state:
                assert state[k] == d, f"asymmetric best-n at {k}"
            else:
                state[k] = d

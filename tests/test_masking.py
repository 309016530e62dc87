"""Masking layer tests (BASELINE config 3: masks fed back into
seeding)."""
import numpy as np
import pytest

from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import MaskConfig, OverlapConfig
from damar_tpu.pipeline import masking
from damar_tpu.utils.sim import make_genome, sample_reads, mutate


class TestDust:
    def test_masks_homopolymer(self):
        s = np.concatenate([
            np.random.default_rng(0).integers(0, 4, 500).astype(np.uint8),
            np.zeros(300, np.uint8),     # poly-A
            np.random.default_rng(1).integers(0, 4, 500).astype(np.uint8)])
        cfg = MaskConfig()
        t = masking.dust_track([s], cfg)
        iv = t.intervals(0)
        assert len(iv) >= 1
        # the poly-A run must be inside a masked interval
        assert any(b <= 520 and e >= 780 for b, e in iv)

    def test_random_mostly_unmasked(self, rng):
        s = rng.integers(0, 4, 3000).astype(np.uint8)
        t = masking.dust_track([s], MaskConfig())
        assert t.masked_bp() < 300


class TestTandem:
    def test_detects_planted_tandem(self):
        rng = np.random.default_rng(3)
        unit = rng.integers(0, 4, 80).astype(np.uint8)
        reads = []
        # read with a 1600bp tandem (20 copies) in the middle
        reads.append(np.concatenate([
            rng.integers(0, 4, 1000).astype(np.uint8),
            np.tile(unit, 20),
            rng.integers(0, 4, 1000).astype(np.uint8)]))
        # plain random read
        reads.append(rng.integers(0, 4, 3000).astype(np.uint8))
        blk = block_from_reads(reads)
        ocfg = OverlapConfig(seed_batch=128, min_len=500)
        t = masking.tandem_track(blk, ocfg, MaskConfig())
        iv0 = t.intervals(0)
        assert len(iv0) >= 1, "planted tandem not found"
        b, e = int(iv0[0][0]), int(iv0[-1][1])
        assert b <= 1100 and e >= 2500, (b, e)
        assert len(t.intervals(1)) == 0, "false tandem in random read"


class TestRepeat:
    def test_coverage_intervals(self):
        ev = [(0, 100), (50, 150), (120, 200)]
        iv = masking.coverage_intervals(ev, 200, 2)
        np.testing.assert_array_equal(iv, [50, 100, 120, 150])

    def test_repeat_track_from_overlaps(self):
        from damar_tpu.formats.las import LasFile, Overlap
        ovls = []
        for b in range(12):
            ovls.append(Overlap(aread=0, bread=b + 1, flags=0,
                                abpos=200, aepos=900, bbpos=0, bepos=700,
                                diffs=0))
        las = LasFile(100, ovls)
        rlen = np.array([2000])
        t = masking.repeat_track_coverage(las, rlen, {0: 0}, 1, cov=10)
        iv = t.intervals(0)
        assert len(iv) == 1
        assert iv[0][0] == 200 and iv[0][1] == 900


class TestMaskFeedback:
    def test_masked_kmers_suppressed(self, rng):
        """Soft-masking a shared segment must kill its seeds (the
        daligner -m feedback path)."""
        from damar_tpu.ops.kmers import mask_vector_from_track
        from damar_tpu.ops.seeding import find_seeds
        shared = rng.integers(0, 4, 400).astype(np.uint8)
        a = np.concatenate([rng.integers(0, 4, 800).astype(np.uint8),
                            shared])
        b = np.concatenate([shared,
                            rng.integers(0, 4, 800).astype(np.uint8)])
        blk_a = block_from_reads([a])
        blk_b = block_from_reads([b])
        cfg = OverlapConfig(seed_batch=128)
        plain = find_seeds(blk_a, blk_b, cfg)
        assert plain["nseeds"] > 0, "shared segment should seed unmasked"
        # mask the shared segment on the A side only (soft masks are
        # applied per-side, like -m in the reference)
        mask = masking.Track("rep", [np.array([800, 1200], np.int32)])
        ma = mask_vector_from_track(mask.data, blk_a.starts, blk_a.cap)
        masked = find_seeds(blk_a, blk_b, cfg, mask_a=ma)
        assert masked["nseeds"] == 0, masked["nseeds"]


class TestColumnarMasking:
    """Differential tests: the columnar masking paths (one global
    event-scatter pass, no per-record objects) vs the scalar
    per-read references."""

    def test_coverage_data_matches_scalar(self, rng):
        nreads = 40
        rlen = rng.integers(50, 400, nreads).astype(np.int64)
        m = 600
        j = rng.integers(0, nreads, m).astype(np.int64)
        b = np.array([rng.integers(0, rlen[x]) for x in j], np.int64)
        e = np.array([min(int(bb) + int(rng.integers(1, 120)),
                          int(rlen[x])) for bb, x in zip(b, j)],
                     np.int64)
        for thr in (1, 2, 3, 7):
            cols = masking._coverage_data(j, b, e, rlen, nreads, thr)
            for r in range(nreads):
                ev = [(int(bb), int(ee)) for bb, ee, x in zip(b, e, j)
                      if x == r]
                ref = masking.coverage_intervals(ev, int(rlen[r]), thr)
                np.testing.assert_array_equal(cols[r], ref, err_msg=(
                    f"read {r} thr {thr}"))

    def test_coverage_data_empty_and_absent_reads(self):
        cols = masking._coverage_data(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.int64), np.array([100, 100]), 2, 2)
        assert len(cols) == 2 and all(len(c) == 0 for c in cols)

    def test_merge_intervals_matches_reference(self, rng):
        from damar_tpu.formats.tracks import merge_interval_lists
        nreads = 25
        m = 300
        j = rng.integers(0, nreads, m).astype(np.int64)
        lo = rng.integers(0, 1000, m).astype(np.int64)
        hi = lo + rng.integers(1, 200, m).astype(np.int64)
        cols = masking._merge_intervals_by_read(j, lo, hi, nreads)
        for r in range(nreads):
            acc = np.zeros(0, np.int32)
            ivs = sorted((int(a), int(c)) for a, c, x in
                         zip(lo, hi, j) if x == r)
            for a, c in ivs:
                acc = merge_interval_lists(
                    acc, np.array([a, c], np.int32))
            np.testing.assert_array_equal(cols[r], acc,
                                          err_msg=f"read {r}")

    def test_repeat_tracks_columnar_vs_objects(self, rng):
        """repeat_track_* consume LasColumns directly; the same las
        materialized as objects must give identical tracks."""
        from damar_tpu.formats.las import LasFile, Overlap
        nreads = 30
        rlen = rng.integers(500, 3000, nreads).astype(np.int64)
        ovls = []
        for _ in range(500):
            a = int(rng.integers(0, nreads))
            ab = int(rng.integers(0, rlen[a] - 100))
            ae = ab + int(rng.integers(50, min(800, rlen[a] - ab)))
            ovls.append(Overlap(aread=a + 7, bread=int(rng.integers(0, 99)),
                                flags=0, abpos=ab, aepos=ae,
                                bbpos=0, bepos=ae - ab, diffs=10))
        las = LasFile(100, ovls)
        idx = {r + 7: r for r in range(nreads)}
        t1 = masking.repeat_track_coverage(las, rlen, idx, nreads, cov=4)
        t2 = masking.repeat_track_relative(las, rlen, idx, nreads)
        # scalar recomputation per read
        for r in range(nreads):
            ev = [(o.abpos, o.aepos) for o in ovls if o.aread == r + 7]
            ref = masking.coverage_intervals(ev, int(rlen[r]), 4)
            np.testing.assert_array_equal(t1.data[r], ref)
        assert t2.expected_coverage > 0

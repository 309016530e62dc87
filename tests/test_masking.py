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

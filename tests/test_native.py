"""Native C runtime: differential tests vs the numpy/python reference
implementations (byte-identical outputs required)."""
import os

import numpy as np
import pytest

from damar_tpu import native
from damar_tpu.formats import las
from damar_tpu.formats.dazzdb import _pack_2bit_np, _unpack_2bit_np
from damar_tpu.formats.oflags import OVL_COMP

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler available")


class TestCodec:
    def test_pack_unpack_matches_numpy(self, rng):
        for n in (0, 1, 3, 7, 4096, 100_001):
            c = rng.integers(0, 4, n).astype(np.uint8)
            assert np.array_equal(native.pack_2bit(c), _pack_2bit_np(c))
            assert np.array_equal(
                native.unpack_2bit(native.pack_2bit(c), n), c)


def _mk(rng, a, b, comp=False):
    abpos = int(rng.integers(0, 300))
    aepos = abpos + int(rng.integers(500, 2000))
    nseg = las.n_segments(abpos, aepos, 100)
    t = np.zeros((nseg, 2), np.int32)
    a0 = abpos
    for s in range(nseg):
        a1 = min((a0 // 100 + 1) * 100, aepos)
        drift = int(rng.integers(-3, 4))
        bspan = max((a1 - a0) + drift, 0)
        t[s] = [abs(bspan - (a1 - a0)) + int(rng.integers(0, 5)), bspan]
        a0 = a1
    return las.Overlap(a, b, OVL_COMP if comp else 0, abpos, aepos,
                       5, 5 + int(t[:, 1].sum()), int(t[:, 0].sum()), t)


class TestLasNative:
    def test_merge_byte_identical_to_python(self, rng, tmp_path):
        import heapq
        paths = []
        for k in range(4):
            ovls = [_mk(rng, int(rng.integers(0, 20)),
                        int(rng.integers(0, 20)), bool(rng.integers(2)))
                    for _ in range(40)]
            f = las.LasFile(100, ovls)
            f.sort()
            p = str(tmp_path / f"p{k}.las")
            las.write_las(p, f)
            paths.append(p)
        out_n = str(tmp_path / "n.las")
        assert native.las_merge(paths, out_n)
        lases = [las.read_las(p) for p in paths]

        def keyed(l):
            for o in l.overlaps:
                yield ((o.aread, o.bread, o.flags & OVL_COMP, o.abpos,
                        o.aepos, o.bbpos), o)

        merged = [o for _, o in heapq.merge(*(keyed(l) for l in lases))]
        out_p = str(tmp_path / "p.las")
        las.write_las(out_p, las.LasFile(100, merged))
        assert open(out_n, "rb").read() == open(out_p, "rb").read()

    def test_merge_missing_input_fails_cleanly(self, tmp_path):
        out = str(tmp_path / "x.las")
        assert not native.las_merge([str(tmp_path / "missing.las")], out)
        assert not os.path.exists(out)

    def test_scan_matches_reader(self, rng, tmp_path):
        ovls = [_mk(rng, i, i + 1) for i in range(30)]
        f = las.LasFile(100, ovls)
        f.sort()
        p = str(tmp_path / "s.las")
        las.write_las(p, f)
        h, tr, offs = native.las_scan(p)
        ref = las.read_las(p)
        assert len(h) == ref.novl
        for i, o in enumerate(ref.overlaps):
            assert (h[i, 7], h[i, 8], h[i, 2], h[i, 4],
                    h[i, 3], h[i, 5], h[i, 1]) == \
                   (o.aread, o.bread, o.abpos, o.aepos,
                    o.bbpos, o.bepos, o.diffs)
            flat = tr[offs[i]:offs[i + 1]].astype(np.int32)
            assert np.array_equal(flat.reshape(-1, 2), o.trace)


class TestNativeTrace:
    def test_trace_points_consistency(self, rng):
        """Native per-segment trace chains satisfy the LAcheck
        invariants on mutated pairs with arbitrary read origins and
        off-boundary start positions."""
        from damar_tpu import native
        from damar_tpu.utils.sim import mutate
        if not native.available():
            return
        r = np.random.default_rng(23)
        for t in range(60):
            n = int(r.integers(300, 1500))
            a = r.integers(0, 4, n).astype(np.uint8)
            b = mutate(a, 0.14, r)
            pre = int(r.integers(0, 177))
            A = np.concatenate([r.integers(0, 4, pre).astype(np.uint8), a])
            B = np.concatenate([r.integers(0, 4, pre).astype(np.uint8), b])
            ts = 100
            off = int(r.integers(0, 97))
            tr, nseg, dsum = native.trace_points_batch(
                A, B, [pre], [pre], [off], [len(a)], [off], [len(b)],
                tspace=ts, band=128, max_segs=64)
            ns = int(nseg[0])
            assert ns == (len(a) - 1) // ts - off // ts + 1
            rows = tr[0, :ns]
            assert rows[:, 1].sum() == len(b) - off
            assert dsum[0] == rows[:, 0].sum()
            a0 = off
            for s in range(ns):
                a1 = min((a0 // ts + 1) * ts, len(a))
                assert rows[s, 0] >= abs((a1 - a0) - rows[s, 1])
                a0 = a1


class TestRevcompReads:
    def test_matches_numpy_gather(self, rng):
        """native.revcomp_reads vs the numpy gather form
        (core.blocks.revcomp_block's fallback)."""
        from damar_tpu.core.blocks import block_from_reads
        reads = [rng.integers(0, 4, int(rng.integers(10, 500)))
                 .astype(np.uint8) for _ in range(25)]
        blk = block_from_reads(reads)
        out = blk.bases.copy()
        assert native.revcomp_reads(blk.bases, blk.starts, out)
        n = blk.nbases
        starts = blk.starts.astype(np.int64)
        rid = blk.read_id[:n].astype(np.int64)
        rev_idx = starts[rid] + starts[rid + 1] - 1 - np.arange(n)
        ref = blk.bases.copy()
        ref[:n] = 3 - blk.bases[rev_idx]
        np.testing.assert_array_equal(out, ref)


class TestDustBatch:
    def test_matches_python(self, rng):
        """native.dust_batch vs utils.dust.dust_read (the numpy
        fallback) on reads with planted low-complexity stretches."""
        from damar_tpu.utils.dust import dust_read
        seqs = []
        for i in range(40):
            s = rng.integers(0, 4, int(rng.integers(50, 3000))) \
                .astype(np.uint8)
            if i % 3 == 0 and len(s) > 500:
                p = int(rng.integers(0, len(s) - 300))
                unit = rng.integers(0, 4, int(rng.integers(1, 5))) \
                    .astype(np.uint8)
                s[p:p + 300] = np.tile(unit,
                                       300 // len(unit) + 1)[:300]
            seqs.append(s)
        nat = native.dust_batch(seqs, 64, 2.0)
        assert nat is not None
        assert sum(len(x) for x in nat) > 0
        for a, s in zip(nat, seqs):
            np.testing.assert_array_equal(a, dust_read(s, 64, 2.0))

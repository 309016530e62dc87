"""Unit tests for the byte-level codecs (SURVEY.md §4 'test pyramid':
round-trip + structural-oracle coverage the reference lacks)."""
import numpy as np
import pytest

from damar_tpu.formats import dazzdb, fasta, las, tracks
from damar_tpu.formats.oflags import OVL_COMP


class TestFasta:
    def test_roundtrip(self, tmp_path, rng):
        seqs = [rng.integers(0, 4, size=n).astype(np.uint8)
                for n in (100, 3, 1, 257)]
        p = str(tmp_path / "x.fasta")
        fasta.write_fasta(p, [f"r{i}" for i in range(4)], seqs)
        hs, ss = fasta.read_fasta(p)
        assert hs == ["r0", "r1", "r2", "r3"]
        for a, b in zip(seqs, ss):
            np.testing.assert_array_equal(a, b)

    def test_encode_unknown_maps_to_a(self):
        assert fasta.encode_seq("acgtN").tolist() == [0, 1, 2, 3, 0]

    def test_revcomp(self):
        s = fasta.encode_seq("acgt")
        np.testing.assert_array_equal(fasta.revcomp(s), s)  # acgt is own rc
        s2 = fasta.encode_seq("aacg")
        assert fasta.decode_seq(fasta.revcomp(s2)) == "cgtt"


class TestPack2bit:
    def test_roundtrip_various_lengths(self, rng):
        for n in (0, 1, 3, 4, 5, 1000, 1023):
            codes = rng.integers(0, 4, size=n).astype(np.uint8)
            packed = dazzdb.pack_2bit(codes)
            assert len(packed) == (n + 3) // 4
            np.testing.assert_array_equal(dazzdb.unpack_2bit(packed, n), codes)

    def test_msb_first(self):
        # acgt -> 0b00_01_10_11 = 0x1B
        assert dazzdb.pack_2bit(fasta.encode_seq("acgt"))[0] == 0x1B


class TestDazzDB:
    def test_create_split_roundtrip(self, tmp_path, rng):
        seqs = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
                for n in rng.integers(600, 9000, size=40)]
        fp = str(tmp_path / "reads.fasta")
        fasta.write_fasta(fp, [f"sim/{i}" for i in range(40)], seqs)
        dbp = str(tmp_path / "TEST.db")
        db = dazzdb.create_db(dbp, [fp])
        assert db.ureads == 40
        for i in (0, 7, 39):
            np.testing.assert_array_equal(db.read_seq(i), seqs[i])

        db = dazzdb.db_split(dbp, size_mb=1, cutoff=1000)
        assert db.nblocks >= 1
        # block ranges tile the read space
        lo0, _ = db.block_range(1)
        assert lo0 == 0
        _, hiN = db.block_range(db.nblocks)
        assert hiN == 40
        # trimmed reads all pass cutoff
        for b in range(1, db.nblocks + 1):
            ids = db.block_reads(b)
            assert (db.reads["rlen"][ids] >= 1000).all()

        # block_seqs concatenation matches individual reads
        bases, starts, ids = db.block_seqs(1)
        for j, i in enumerate(ids):
            np.testing.assert_array_equal(
                bases[starts[j]:starts[j + 1]], seqs[i])

    def test_stats(self, tmp_path, rng):
        seqs = [rng.integers(0, 4, size=2000).astype(np.uint8)
                for _ in range(5)]
        fp = str(tmp_path / "r.fasta")
        fasta.write_fasta(fp, [f"s{i}" for i in range(5)], seqs)
        dbp = str(tmp_path / "S.db")
        dazzdb.create_db(dbp, [fp])
        st = dazzdb.db_stats(dbp)
        assert st["total_bp"] == 10000 and st["n50"] == 2000


def _mk_ovl(rng, aread, bread, tspace=100, comp=False):
    abpos = int(rng.integers(0, 500))
    alen = int(rng.integers(1000, 3000))
    aepos = abpos + alen
    nseg = las.n_segments(abpos, aepos, tspace)
    # per-segment a-span
    aspans = []
    a0 = abpos
    for _ in range(nseg):
        a1 = min((a0 // tspace + 1) * tspace, aepos)
        aspans.append(a1 - a0)
        a0 = a1
    trace = np.zeros((nseg, 2), dtype=np.int32)
    for s, asp in enumerate(aspans):
        drift = int(rng.integers(-3, 4))
        trace[s, 1] = max(asp + drift, 0)   # bspan can never go negative
        trace[s, 0] = abs(trace[s, 1] - asp) + int(rng.integers(0, 5))
    bbpos = int(rng.integers(0, 100))
    bepos = bbpos + int(trace[:, 1].sum())
    return las.Overlap(
        aread=aread, bread=bread, flags=OVL_COMP if comp else 0,
        abpos=abpos, aepos=aepos, bbpos=bbpos, bepos=bepos,
        diffs=int(trace[:, 0].sum()), trace=trace)


class TestLas:
    def test_roundtrip_small_trace(self, tmp_path, rng):
        ovls = [_mk_ovl(rng, a, b) for a in range(3) for b in range(4)]
        f = las.LasFile(tspace=100, overlaps=ovls)
        f.sort()
        p = str(tmp_path / "t.las")
        las.write_las(p, f)
        g = las.read_las(p)
        assert g.novl == f.novl and g.tspace == 100
        for x, y in zip(f.overlaps, g.overlaps):
            assert (x.aread, x.bread, x.abpos, x.aepos, x.bbpos, x.bepos,
                    x.diffs, x.flags) == \
                   (y.aread, y.bread, y.abpos, y.aepos, y.bbpos, y.bepos,
                    y.diffs, y.flags)
            np.testing.assert_array_equal(x.trace, y.trace)

    def test_roundtrip_wide_trace(self, tmp_path, rng):
        ovls = [_mk_ovl(rng, 0, 1, tspace=126)]
        p = str(tmp_path / "w.las")
        las.write_las(p, las.LasFile(tspace=126, overlaps=ovls))
        g = las.read_las(p)
        np.testing.assert_array_equal(g.overlaps[0].trace, ovls[0].trace)

    def test_check_catches_corruption(self, rng):
        o = _mk_ovl(rng, 0, 1)
        rlen = np.full(5, 10_000)
        clean = las.check_las(las.LasFile(100, [o]), rlen)
        assert clean == []
        bad = las.Overlap(**{**o.__dict__, "bepos": o.bepos + 5})
        errs = las.check_las(las.LasFile(100, [bad]), rlen)
        assert any("b-span" in e for e in errs)
        bad2 = las.Overlap(**{**o.__dict__, "aepos": 20_000})
        errs2 = las.check_las(las.LasFile(100, [bad2]), rlen)
        assert any("bad A interval" in e for e in errs2)

    def test_columnar_check_matches_object_check(self, tmp_path, rng):
        ovls = [_mk_ovl(rng, int(rng.integers(0, 5)),
                        int(rng.integers(0, 5)),
                        comp=bool(rng.integers(2))) for _ in range(40)]
        f = las.LasFile(100, ovls)
        f.sort()
        p = str(tmp_path / "c.las")
        las.write_las(p, f)
        g = las.read_las(p)                 # columnar
        rlen = np.full(8, 10_000)
        assert g.columns is not None
        assert las.check_las(g, rlen) == []
        # corrupt one record's bepos in the columns: columnar check
        # flags the same class of error as the object walk
        g2 = las.read_las(p)
        g2.columns.headers[7, las.H_BEPOS] += 3
        errs = las.check_las(g2, rlen)
        assert any("b-span" in e for e in errs)
        # unsorted order detected
        g3 = las.read_las(p)
        g3.columns.headers[[0, -1]] = g3.columns.headers[[-1, 0]]
        errs3 = las.check_las(g3, rlen, sorted_order=True)
        assert any("sort order" in e for e in errs3)

    def test_columnar_concat_and_lazy_materialize(self, tmp_path, rng):
        a = [_mk_ovl(rng, 0, 1), _mk_ovl(rng, 0, 2)]
        b = [_mk_ovl(rng, 1, 2)]
        fa, fb = las.LasFile(100, a), las.LasFile(100, b)
        pa, pb = str(tmp_path / "a.las"), str(tmp_path / "b.las")
        las.write_las(pa, fa)
        las.write_las(pb, fb)
        ca, cb = las.read_las(pa), las.read_las(pb)
        cat = las.LasFile.concat([ca, cb])
        assert cat.columns is not None and cat.novl == 3
        spans = cat.a_spans()
        assert list(spans) == [o.aepos - o.abpos for o in a + b]
        # materialization drops columns (objects may be mutated)
        objs = cat.overlaps
        assert cat.columns is None and len(objs) == 3
        np.testing.assert_array_equal(objs[2].trace, b[0].trace)

    def test_sort_and_merge(self, tmp_path, rng):
        all_ovls = [_mk_ovl(rng, int(rng.integers(0, 5)),
                            int(rng.integers(0, 5)), comp=bool(rng.integers(2)))
                    for _ in range(30)]
        parts = [all_ovls[:10], all_ovls[10:20], all_ovls[20:]]
        paths = []
        for i, pt in enumerate(parts):
            f = las.LasFile(100, list(pt))
            f.sort()
            p = str(tmp_path / f"p{i}.las")
            las.write_las(p, f)
            paths.append(p)
        out = str(tmp_path / "m.las")
        las.merge_las(paths, out)
        m = las.read_las(out)
        assert m.novl == 30
        keys = [(o.aread, o.bread, o.flags & OVL_COMP, o.abpos)
                for o in m.overlaps]
        assert keys == sorted(keys)


class TestTracks:
    def test_roundtrip(self, tmp_path, rng):
        data = [np.sort(rng.integers(0, 1000, size=2 * int(k))).astype(np.int32)
                for k in rng.integers(0, 4, size=10)]
        dbp = str(tmp_path / "T.db")
        open(dbp, "w").write("files =         0\n")
        t = tracks.Track(name="dust", data=data)
        tracks.write_track(dbp, t)
        u = tracks.read_track(dbp, "dust")
        assert u.nreads == 10
        for a, b in zip(t.data, u.data):
            np.testing.assert_array_equal(a, b)

    def test_interval_algebra(self):
        a = np.array([0, 10, 20, 30], np.int32)
        b = np.array([5, 25], np.int32)
        u = tracks.merge_interval_lists(a, b)
        np.testing.assert_array_equal(u, [0, 30])
        i = tracks.intersect_interval_lists(a, b)
        np.testing.assert_array_equal(i, [5, 10, 20, 25])

    def test_combine_and_blockmerge(self, tmp_path):
        dbp = str(tmp_path / "C.db")
        open(dbp, "w").write("files =         0\n")
        t1 = tracks.Track("x", [np.array([0, 10], np.int32),
                                np.zeros(0, np.int32)])
        t2 = tracks.Track("y", [np.array([5, 15], np.int32),
                                np.array([1, 2], np.int32)])
        u = tracks.combine_tracks([t1, t2], "u", "union")
        np.testing.assert_array_equal(u.data[0], [0, 15])
        np.testing.assert_array_equal(u.data[1], [1, 2])
        # per-block merge
        tracks.write_track(dbp, tracks.Track("m", [t1.data[0]]), block=1)
        tracks.write_track(dbp, tracks.Track("m", [t2.data[1]]), block=2)
        full = tracks.merge_block_tracks(dbp, "m", 2, [(0, 1), (1, 2)], 2)
        np.testing.assert_array_equal(full.data[1], [1, 2])
        reread = tracks.read_track(dbp, "m")
        np.testing.assert_array_equal(reread.data[0], [0, 10])


class TestBlocks:
    def test_build_block(self, rng):
        from damar_tpu.core import blocks
        reads = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
                 for n in (100, 50, 200)]
        blk = blocks.block_from_reads(reads)
        assert blk.nreads == 3 and blk.nbases == 350
        assert blk.cap % (1 << 18) == 0
        np.testing.assert_array_equal(blk.bases[100:150], reads[1])
        assert (blk.bases[350:] == blocks.PAD_BASE).all()
        assert blk.read_id[99] == 0 and blk.read_id[100] == 1
        assert blk.read_id[-1] == 3  # padding sentinel

    def test_revcomp_block(self, rng):
        from damar_tpu.core import blocks
        from damar_tpu.formats.fasta import revcomp
        reads = [rng.integers(0, 4, size=60).astype(np.uint8)
                 for _ in range(2)]
        blk = blocks.block_from_reads(reads)
        rc = blocks.revcomp_block(blk)
        np.testing.assert_array_equal(rc.bases[0:60], revcomp(reads[0]))
        np.testing.assert_array_equal(rc.bases[60:120], revcomp(reads[1]))


class TestLasCorruptionRobustness:
    def test_reader_rejects_corrupt_files_gracefully(self, tmp_path,
                                                     rng):
        """Every corruption mode must raise a clean error — never a
        giant header-sized allocation, never a crash."""
        from damar_tpu.formats.las import (LasFile, Overlap, read_las,
                                           write_las)
        tr = np.array([[15, 100], [15, 100], [10, 100], [5, 100],
                       [5, 100]], np.int32)
        ovls = [Overlap(aread=0, bread=1, abpos=0, aepos=500,
                        bbpos=10, bepos=510, flags=0, diffs=50,
                        trace=tr) for _ in range(5)]
        p = str(tmp_path / "ok.las")
        write_las(p, LasFile(100, ovls))
        assert read_las(p).novl == 5
        raw = open(p, "rb").read()
        cases = {
            "truncated_mid_record": raw[:len(raw) // 2],
            "truncated_header": raw[:6],
            "huge_novl": np.int64(10 ** 15).tobytes() + raw[8:],
            "negative_novl": np.int64(-5).tobytes() + raw[8:],
            "trailing_garbage": raw + b"\xff" * 33,
            "empty": b"",
        }
        for name, data in cases.items():
            q = str(tmp_path / f"{name}.las")
            open(q, "wb").write(data)
            with pytest.raises((ValueError, OSError)):
                read_las(q)


class TestDbCorruptionRobustness:
    def test_truncated_bps_raises(self, tmp_path, rng):
        """A truncated .bps must raise on first read — the native
        2-bit unpacker must never see an index-addressed slice the
        file cannot back (out-of-bounds read, silent garbage)."""
        from damar_tpu.formats import dazzdb
        from damar_tpu.utils.sim import (make_genome, sample_reads,
                                         write_sim_fasta)
        g = make_genome(8_000, seed=31)
        sim = sample_reads(g, coverage=3, mean_len=2000, err=0.1,
                           seed=32)
        fa = str(tmp_path / "r.fasta")
        write_sim_fasta(fa, sim)
        dbp = str(tmp_path / "E.db")
        dazzdb.create_db(dbp, [fa])
        bps = dazzdb.bps_path(dbp)
        data = open(bps, "rb").read()
        open(bps, "wb").write(data[:4])
        db = dazzdb.DazzDB.open(dbp)
        with pytest.raises(ValueError):
            db.read_seq(0)

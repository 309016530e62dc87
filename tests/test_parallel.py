"""Multi-device tests on the 8-device virtual CPU mesh: block sharding
+ ring-rotation overlap sweep (SURVEY.md §2.10).  Kept at tiny shapes —
8 virtual devices share one physical CPU, so per-device work must be
small (the real-scale path is exercised single-chip in test_overlap)."""
import numpy as np
import jax
import pytest

from damar_tpu.core.blocks import block_from_reads, round_up
from damar_tpu.core.config import OverlapConfig
from damar_tpu.parallel.distributed import (
    distributed_overlap, make_mesh, shard_blocks)
from damar_tpu.utils.sim import make_genome, sample_reads


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should give 8 cpu devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def tiny_sharded():
    g = make_genome(6000, seed=0)
    sim = sample_reads(g, coverage=3.0, mean_len=1200, err=0.12,
                       seed=1, min_len=600)
    n = len(sim.reads)
    per = -(-n // 8)
    groups = [np.arange(d * per, min((d + 1) * per, n)) for d in range(8)]
    cap = round_up(max(sum(len(sim.reads[i]) for i in ids)
                       for ids in groups) + 4, 4096)
    blocks = [block_from_reads([sim.reads[i] for i in ids],
                               ids=ids, cap=cap) for ids in groups]
    return sim, blocks, groups


class TestRingOverlap:
    def test_all_pairs_meet(self, mesh8, tiny_sharded):
        sim, blocks, groups = tiny_sharded
        cfg = OverlapConfig(seed_batch=128, min_len=500,
                            max_read_len=8192)
        exts, counts, total = distributed_overlap(
            blocks, cfg, mesh=mesh8, seed_cap=512, hit_cap=1 << 14)
        assert exts.shape[:2] == (8, 8)
        assert total[1] > 0, "no extents found"

        found = set()
        n_rows = 0
        for i in range(8):
            for j in range(8):
                for row in exts[i, j]:
                    ar, br = int(row[0]), int(row[1])
                    if ar < 0:
                        continue
                    n_rows += 1
                    assert int(row[7]) >= 0, "extent carries no diffs"
                    ga = int(groups[i][ar])
                    gb = int(groups[j][br])
                    assert ga != gb, "self-pair leaked through ring"
                    found.add((ga, gb))
        assert n_rows == int(total[1])
        # precision: emitted extents should be true overlaps
        bad = sum(1 for (a, b) in found
                  if not sim.true_overlap(a, b, 200))
        assert bad / max(len(found), 1) < 0.1, f"{bad}/{len(found)}"
        # recall over ALL overlapping pairs (the canonical ring pass
        # covers both orientations)
        n = len(sim.reads)
        nt = nf = 0
        for a in range(n):
            for b in range(n):
                if a != b and sim.true_overlap(a, b, 800):
                    nt += 1
                    if (a, b) in found:
                        nf += 1
        assert nf / max(nt, 1) > 0.8, f"ring recall {nf}/{nt}"

    def test_shard_blocks_layout(self, mesh8, rng):
        reads = [rng.integers(0, 4, 500).astype(np.uint8)
                 for _ in range(16)]
        cap = 1 << 13
        blocks = [block_from_reads(reads[i::8], cap=cap) for i in range(8)]
        bases, rid, starts, mpb = shard_blocks(blocks, mesh8)
        assert mpb.shape == (8, cap) and mpb.dtype == np.uint32
        assert bases.shape == (8, cap)
        assert len(bases.sharding.device_set) == 8


class TestMultiHost:
    def test_host_pair_slice_partitions_matrix(self):
        from damar_tpu.parallel.distributed import (block_pair_matrix,
                                                    host_pair_slice)
        for n, h in ((1, 1), (5, 2), (7, 3), (10, 4)):
            full = block_pair_matrix(n)
            assert len(full) == n * (n + 1) // 2
            slices = [host_pair_slice(n, h, k) for k in range(h)]
            got = [p for s in slices for p in s]
            assert sorted(got) == sorted(full)           # exhaustive
            assert len(set(got)) == len(got)             # disjoint
            sizes = [len(s) for s in slices]
            assert max(sizes) - min(sizes) <= 1          # balanced

    def test_two_host_plan_equals_single_host(self, tmp_path):
        """Two 'hosts' running their slices over a shared dir produce
        the same merged .las set as one host (file rendezvous)."""
        import glob
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats import dazzdb, las as lasmod
        from damar_tpu.pipeline.planner import run_overlap_plan
        from damar_tpu.utils.sim import (make_genome, sample_reads,
                                         write_sim_fasta)
        g = make_genome(150_000, seed=31)
        sim = sample_reads(g, coverage=8, mean_len=3000, err=0.12,
                           seed=32)
        cfg = OverlapConfig(min_len=800)
        outs = {}
        for mode in ("single", "multi"):
            w = str(tmp_path / mode)
            import os
            os.makedirs(w)
            write_sim_fasta(f"{w}/r.fasta", sim)
            dazzdb.create_db(f"{w}/E.db", [f"{w}/r.fasta"])
            dazzdb.db_split(f"{w}/E.db", size_mb=1, cutoff=500)
            assert dazzdb.DazzDB.open(f"{w}/E.db").nblocks >= 2
            if mode == "single":
                run_overlap_plan(f"{w}/E.db", cfg, verbose=False)
            else:
                s0 = run_overlap_plan(f"{w}/E.db", cfg, verbose=False,
                                      nhosts=2, host_id=0)
                s1 = run_overlap_plan(f"{w}/E.db", cfg, verbose=False,
                                      nhosts=2, host_id=1)
                assert s0["pairs"] + s1["pairs"] >= 1
            outs[mode] = {
                os.path.basename(p): lasmod.read_las(p)
                for p in sorted(glob.glob(f"{w}/E.[0-9].las"))}
        assert outs["single"].keys() == outs["multi"].keys()
        assert outs["multi"], "no merged outputs"
        for k in outs["single"]:
            a, b = outs["single"][k], outs["multi"][k]
            assert a.novl == b.novl, (k, a.novl, b.novl)
            ha = a.columns.headers if a.columns is not None else None
            hb = b.columns.headers if b.columns is not None else None
            assert ha is not None and hb is not None
            np.testing.assert_array_equal(ha, hb)
            np.testing.assert_array_equal(a.columns.trace,
                                          b.columns.trace)


class TestDistributedLas:
    def test_ring_las_matches_pair_driver(self, mesh8, rng):
        """distributed_overlap_las shards must be structurally valid
        and find (nearly) the pairs the single-chip driver finds."""
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats.las import check_las
        from damar_tpu.parallel.distributed import distributed_overlap_las
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(24_000, seed=61)
        sim = sample_reads(g, coverage=6, mean_len=2500, err=0.12,
                           seed=62, min_len=1200)
        reads = sim.reads
        per = -(-len(reads) // 8)
        cap = 1 << 17
        groups, blocks = [], []
        gid = []
        for d in range(8):
            ids = list(range(d * per, min((d + 1) * per, len(reads))))
            ids = ids or [0]
            gid.append(ids)
            blocks.append(block_from_reads([reads[i] for i in ids],
                                           cap=cap))
        cfg = OverlapConfig(min_len=900, max_read_len=16384,
                            seed_batch=256)
        las_list, counts, total = distributed_overlap_las(
            blocks, cfg, mesh=mesh8, seed_cap=1024, hit_cap=1 << 16)
        novl = sum(las.novl for las in las_list)
        assert novl > 0, "ring las produced nothing"
        # ground-truth recall at the pair level using the counts from
        # extents is covered by test_all_pairs_meet; here assert the
        # .las records are trace-consistent
        for d, las in enumerate(las_list):
            rl = np.array([len(reads[i]) for i in gid[d]])
            # bread lengths: can span any block; build a max-length
            # vector over all local ordinals
            rb = np.full(per + 1, max(len(r) for r in reads))
            errs = check_las(las, rl, rb, sorted_order=True)
            assert not errs, errs[:3]


class TestVirtualPodAssembly:
    def test_ring_sweep_to_polished_contig(self, mesh8, tmp_path):
        """Full multi-chip story on the virtual mesh: 8 sharded
        blocks -> ring-sweep overlap -> per-chip .las shards ->
        deterministic merge -> graph/tour -> polish -> contig
        identity vs the truth genome."""
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats.las import merge_las, read_las, write_las
        from damar_tpu.formats.fasta import revcomp
        from damar_tpu.parallel.distributed import distributed_overlap_las
        from damar_tpu.pipeline.consensus import full_layout, polish_rounds
        from damar_tpu.pipeline.touring import assemble, tour_layout
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(40_000, seed=71)
        sim = sample_reads(g, coverage=10, mean_len=3500, err=0.12,
                           seed=72, min_len=1500)
        reads = sim.reads
        per = -(-len(reads) // 8)
        blocks = []
        for d in range(8):
            ids = list(range(d * per, min((d + 1) * per, len(reads))))
            ids = ids or [0]
            blocks.append(block_from_reads(
                [reads[i] for i in ids],
                ids=np.array(ids, np.int64), cap=1 << 17))
        cfg = OverlapConfig(min_len=900, max_read_len=16384,
                            seed_batch=256)
        las_list, counts, total = distributed_overlap_las(
            blocks, cfg, mesh=mesh8, seed_cap=2048, hit_cap=1 << 17)
        paths = []
        for d, las in enumerate(las_list):
            p = str(tmp_path / f"shard.{d}.las")
            write_las(p, las)
            paths.append(p)
        merged = str(tmp_path / "merged.las")
        merge_las(paths, merged)
        full = read_las(merged)
        assert full.novl == sum(l.novl for l in las_list)
        rlen_of = {i: len(r) for i, r in enumerate(reads)}

        def seq_of(i, d):
            return revcomp(reads[i]) if d else reads[i]

        contigs, tours, _ = assemble(full, rlen_of, seq_of,
                                     min_dovetail=900)
        assert contigs, "no contigs from the ring-sweep las"
        best = int(np.argmax([len(c) for c in contigs]))
        lay = full_layout(tour_layout(tours[best], seq_of), full,
                          rlen_of)
        polished = polish_rounds(contigs[best], lay, seq_of,
                                 circular=tours[best].circular)
        assert len(polished) > 0.8 * len(g)
        from damar_tpu.utils.sim import kmer_hit_rate
        hit = kmer_hit_rate(g, polished)
        assert hit > 0.45, f"polished k-mer hit rate {hit:.3f}"


class TestRingByteEquality:
    """VERDICT r1 item 4: the mesh path must produce the PAIR DRIVER's
    bytes, not just structurally valid shards.  Blocks are built so
    within-block reads never overlap (reads dealt by genome position),
    which makes every ring record attributable to one ordered
    cross-block pair that the pair driver can reproduce exactly."""

    def _spread_blocks(self, nblocks, seed, genome=40_000, cov=3.0):
        from damar_tpu.utils.sim import make_genome, sample_reads
        g = make_genome(genome, seed=seed)
        sim = sample_reads(g, coverage=cov, mean_len=3000, err=0.12,
                           seed=seed + 1, min_len=1500, circular=False)
        order = np.argsort(sim.start)
        cap = 1 << 16
        blocks = []
        for d in range(nblocks):
            ids = order[d::nblocks]
            blocks.append(block_from_reads(
                [sim.reads[i] for i in ids],
                ids=np.asarray(ids, np.int64), cap=cap))
        return sim, blocks

    def _pair_driver_shards(self, blocks, cfg):
        from damar_tpu.formats.las import LasFile
        from damar_tpu.pipeline.overlap import overlap_block_pair
        n = len(blocks)
        shards = []
        for i in range(n):
            parts = []
            for j in range(n):
                if i == j:
                    continue
                la, _, _ = overlap_block_pair(
                    blocks[i], blocks[j], cfg, self_block=False,
                    emit_mirrors=False, hit_cap=1 << 16,
                    seed_cap=1 << 12)
                parts.append(la)
            las = LasFile.concat(parts) if parts else LasFile(
                cfg.tspace, [])
            las.sort()
            shards.append(las)
        return shards

    def _assert_equal(self, ring, pair, tmp_path, tag):
        from damar_tpu.formats.las import write_las
        for d, (r, p) in enumerate(zip(ring, pair)):
            fr = str(tmp_path / f"{tag}.ring.{d}.las")
            fp = str(tmp_path / f"{tag}.pair.{d}.las")
            write_las(fr, r)
            write_las(fp, p)
            rb = open(fr, "rb").read()
            pb = open(fp, "rb").read()
            assert rb == pb, (
                f"shard {d}: ring {r.novl} recs != pair {p.novl} recs"
                if r.novl != p.novl else f"shard {d}: bytes differ")

    def test_byte_equality_8_blocks(self, mesh8, tmp_path):
        from damar_tpu.parallel.distributed import distributed_overlap_las
        sim, blocks = self._spread_blocks(8, seed=81)
        cfg = OverlapConfig(min_len=900, max_read_len=16384,
                            seed_batch=256)
        ring, counts, total = distributed_overlap_las(
            blocks, cfg, mesh=mesh8, seed_cap=1024, hit_cap=1 << 16)
        assert sum(l.novl for l in ring) > 0
        pair = self._pair_driver_shards(blocks, cfg)
        self._assert_equal(ring, pair, tmp_path, "eq8")

    def test_byte_equality_multiround_12_blocks(self, mesh8, tmp_path):
        """nblocks > ndevices: 12 blocks on 8 devices (2x2 ring
        sweeps with empty padding)."""
        from damar_tpu.parallel.distributed import distributed_overlap_las
        sim, blocks = self._spread_blocks(12, seed=83)
        cfg = OverlapConfig(min_len=900, max_read_len=16384,
                            seed_batch=256)
        ring, counts, total = distributed_overlap_las(
            blocks, cfg, mesh=mesh8, seed_cap=1024, hit_cap=1 << 16)
        assert sum(l.novl for l in ring) > 0
        pair = self._pair_driver_shards(blocks, cfg)
        self._assert_equal(ring, pair, tmp_path, "eq12")

    def test_seed_cap_grow_retry(self, mesh8):
        """A deliberately tiny seed_cap must grow-retry, not raise."""
        from damar_tpu.parallel.distributed import distributed_overlap_las
        sim, blocks = self._spread_blocks(8, seed=85, cov=4.0)
        cfg = OverlapConfig(min_len=900, max_read_len=16384,
                            seed_batch=256)
        ring, counts, total = distributed_overlap_las(
            blocks, cfg, mesh=mesh8, seed_cap=8, hit_cap=1 << 16)
        assert sum(l.novl for l in ring) > 0

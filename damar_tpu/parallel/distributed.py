"""Distributed overlap: A-shards resident, B-shards ring-rotated.

The reference parallelizes by a block-pair job matrix over cluster
nodes with a shared filesystem (SURVEY.md §2.9); the TPU-native design
holds one A-shard resident per chip and rotates B-shards around the
mesh ring with lax.ppermute so every (A, B) block pair meets on some
chip after n_devices rotations — no host round-trips, collectives ride
ICI.  The rotated payload includes the B-shard's CANONICAL k-mer index
(codes + strand-packed positions), so each shard's index is built once
and then travels the ring instead of being re-sorted at every
rotation.  Seeding is the canonical single-pass design of
ops.seeding.find_seeds_canonical_dev (both orientations from one
merge, comp bit in the band key); extension is the bit-parallel band
kernel (ops.wave_bp).  Per-rotation outputs are fixed-capacity extent
tensors plus psum'd counters.

This module is exercised on virtual CPU meshes in tests and by the
driver's dryrun; on a real pod slice the same code runs unchanged over
a jax.distributed-initialized mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from damar_tpu.core.config import OverlapConfig


def make_mesh(n_devices: int | None = None, axis: str = "block") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_blocks(blocks: list, mesh: Mesh, axis: str = "block"):
    """Stack per-device ReadBlocks (equal caps required) into sharded
    arrays: bases [n, cap], read_id [n, cap], starts [n, nr+1],
    with the leading axis sharded over the mesh."""
    n = len(blocks)
    cap = blocks[0].cap
    assert all(b.cap == cap for b in blocks), "blocks must share capacity"
    nr = max(b.nreads for b in blocks)
    bases = np.stack([b.bases for b in blocks])
    rid = np.stack([b.read_id for b in blocks])
    starts = np.full((n, nr + 1), 0, np.int32)
    for i, b in enumerate(blocks):
        s = b.starts.astype(np.int32)
        starts[i, :len(s)] = s
        starts[i, len(s):] = s[-1]
    sh = NamedSharding(mesh, P(axis))
    return (jax.device_put(bases, sh), jax.device_put(rid, sh),
            jax.device_put(starts, sh))


def _revcomp_device(bases, read_id, starts):
    """Per-read reverse complement of a padded block, on device: the
    rc of position p in read r sits at starts[r] + starts[r+1] - 1 - p
    (read layout preserved, padding untouched)."""
    n = bases.shape[0]
    p = jnp.arange(n, dtype=jnp.int32)
    r = jnp.clip(read_id, 0, starts.shape[0] - 2)
    src = starts[r] + starts[r + 1] - 1 - p
    inside = (p >= starts[r]) & (p < starts[r + 1])
    src = jnp.clip(src, 0, n - 1)
    rc = jnp.where(inside, 3 - bases[src], bases)
    return rc.astype(bases.dtype)


def ring_overlap_step(cfg: OverlapConfig, axis: str, n_shards: int,
                      seed_cap: int, hit_cap: int):
    """Build the per-device function for one full ring sweep.

    Returns fn(a_bases, a_rid, a_starts, b_bases, b_rid, b_starts) ->
    (extents [n_shards, seed_cap, 7], counts [n_shards, 2]) where
    extents rows are (aread, bread_local, comp, abpos, aepos, bbpos,
    bepos); comp rows carry b coordinates in the B read's
    reverse-complement frame (the .las COMP convention).  bread is
    local to the B shard resident at that rotation (callers map via
    rotation index).

    Designed for use under shard_map: every device runs this on its
    resident A-shard while B (bases + canonical index) rotates.
    """
    from damar_tpu.ops.seeding import (build_index_canonical,
                                       diagonal_filter_comp,
                                       match_count, match_fill,
                                       quantize_bits, _split_strand_hits)
    from damar_tpu.ops.wave_bp import extend_wave_bp

    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local_pair(a_bases, a_rid, a_starts, a_index,
                   b_bases, b_rid, b_starts, b_index, is_self):
        """Canonical both-orientation seeding + bp extension for the
        resident (A, B) pair.  is_self (traced bool): this rotation
        pairs the shard with its own block — suppress read-vs-itself
        seeds."""
        ac, ap2 = a_index
        bc, bp2 = b_index
        t = cfg.max_kmer_count or 128
        lo, cnt, cum, _tot = match_count(ac, ap2, bc, bp2, k=cfg.kmer,
                                         max_count=t)
        ap2v, bp2v, nhits, total_hits = match_fill(ap2, bp2, lo, cnt,
                                                   cum, hit_cap=hit_cap)
        apos, bpos, comp = _split_strand_hits(ap2v, bp2v, b_rid,
                                              b_starts, cfg.kmer)
        nr = b_starts.shape[0]
        ar, br, sap, sbp, cov, scomp, nseeds, _ts = diagonal_filter_comp(
            apos, bpos, comp, nhits, a_rid, b_rid,
            pos_bits=int(a_bases.shape[0] - 1).bit_length(),
            read_bits=quantize_bits(nr),
            band_shift=cfg.band_shift, hit_min=cfg.hit_min,
            kmer=cfg.kmer, seed_cap=seed_cap, upper_only=False,
            suppress_equal=is_self)
        live = jnp.arange(seed_cap) < nseeds
        ar_c = jnp.maximum(ar, 0)
        br_c = jnp.maximum(br, 0)
        astart = a_starts[ar_c]
        aend = a_starts[ar_c + 1]
        bstart = b_starts[br_c]
        bend = b_starts[br_c + 1]
        sap_c = jnp.clip(sap, 0, None)
        sbp_c = jnp.clip(sbp, 0, None)
        kw = dict(R=cfg.bp_chunk, max_rows=cfg.max_read_len,
                  diff_cost=cfg.diff_cost, xdrop=cfg.xdrop)
        b_rc = _revcomp_device(b_bases, b_rid, b_starts)
        isc = scomp == 1
        exts = []
        for cflag, bb in ((False, b_bases), (True, b_rc)):
            sel = live & (isc == cflag)
            fva, fvb, fd, _ = extend_wave_bp(
                a_bases, bb, sap_c, sbp_c,
                jnp.where(sel, aend - sap_c, 0),
                jnp.where(sel, bend - sbp_c, 0), reverse=False, **kw)
            rva, rvb, rd, _ = extend_wave_bp(
                a_bases, bb, sap_c, sbp_c,
                jnp.where(sel, sap_c - astart, 0),
                jnp.where(sel, sbp_c - bstart, 0), reverse=True, **kw)
            ext = jnp.stack([
                ar, br, scomp,
                sap_c - astart - rva, sap_c - astart + fva,
                sbp_c - bstart - rvb, sbp_c - bstart + fvb], axis=1)
            ok = sel & ((fva + rva) >= cfg.min_len)
            exts.append(jnp.where(ok[:, None], ext, -1))
        ext = jnp.where(exts[0][:, :1] >= 0, exts[0], exts[1])
        ok_n = (ext[:, 0] >= 0).sum().astype(jnp.int32)
        return ext, jnp.stack([nseeds, ok_n])

    def sweep(a_bases, a_rid, a_starts, b_bases, b_rid, b_starts):
        # squeeze the sharded leading axis (shard_map gives [1, ...])
        a_bases, a_rid, a_starts = (a_bases[0], a_rid[0], a_starts[0])
        b_bases, b_rid, b_starts = (b_bases[0], b_rid[0], b_starts[0])

        a_index = build_index_canonical(a_bases, a_rid, cfg.kmer)
        # the B index is computed ONCE per shard and rotated with the
        # shard — rotations ppermute (bases, rid, starts, codes, pos2)
        b_index = build_index_canonical(b_bases, b_rid, cfg.kmer)

        def rot_body(i, carry):
            bb, br_, bs, bc, bp2, exts, counts = carry
            # ppermute sends right / receives left: at rotation i the
            # device holds B-shard (my - i) % n; i == 0 pairs a block
            # with itself
            ext, cnt = local_pair(a_bases, a_rid, a_starts, a_index,
                                  bb, br_, bs, (bc, bp2), i == 0)
            exts = jax.lax.dynamic_update_index_in_dim(exts, ext, i, 0)
            counts = jax.lax.dynamic_update_index_in_dim(counts, cnt, i, 0)
            bb = jax.lax.ppermute(bb, axis, perm)
            br_ = jax.lax.ppermute(br_, axis, perm)
            bs = jax.lax.ppermute(bs, axis, perm)
            bc = jax.lax.ppermute(bc, axis, perm)
            bp2 = jax.lax.ppermute(bp2, axis, perm)
            return bb, br_, bs, bc, bp2, exts, counts

        exts0 = jnp.full((n_shards, seed_cap, 7), -1, jnp.int32)
        counts0 = jnp.zeros((n_shards, 2), jnp.int32)
        _, _, _, _, _, exts, counts = jax.lax.fori_loop(
            0, n_shards, rot_body,
            (b_bases, b_rid, b_starts, b_index[0], b_index[1],
             exts0, counts0))
        total = jax.lax.psum(counts.sum(0), axis)
        return exts[None], counts[None], total[None]

    return sweep


def distributed_overlap(blocks: list, cfg: OverlapConfig,
                        mesh: Mesh | None = None, seed_cap: int = 4096,
                        hit_cap: int = 1 << 18):
    """All-vs-all overlap of n blocks over an n-device mesh: one ring
    sweep; returns per-device per-rotation extents + global counters.

    The j-th rotation on device d processed B-shard (d - j) % n, so
    extents[d, j] pairs A-block d with B-block (d - j) % n.  Extent
    rows are (aread, bread, comp, abpos, aepos, bbpos, bepos) with -1
    marking empty slots.
    """
    if mesh is None:
        mesh = make_mesh(len(blocks))
    axis = mesh.axis_names[0]
    n = len(blocks)
    a_bases, a_rid, a_starts = shard_blocks(blocks, mesh, axis)
    fn = ring_overlap_step(cfg, axis, n, seed_cap, hit_cap)
    mapped = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False))
    exts, counts, total = mapped(a_bases, a_rid, a_starts,
                                 a_bases, a_rid, a_starts)
    return np.asarray(exts), np.asarray(counts), np.asarray(total)[0]


def distributed_overlap_las(blocks: list, cfg: OverlapConfig,
                            mesh: Mesh | None = None,
                            seed_cap: int = 4096,
                            hit_cap: int = 1 << 18):
    """Full distributed overlap to .las: ring-sweep extent discovery
    on the mesh, then per-pair dedupe + trace emission through the
    same path as the block-pair driver (overlap.las_from_extents).

    Returns (las_list, counts, total): las_list[d] is the sorted
    LasFile of A-block d against every block — the per-chip ".las
    shard" of SURVEY.md §7.9; callers write the shards and merge them
    deterministically on the host (formats.las.merge_las).
    """
    from damar_tpu.core.blocks import revcomp_block
    from damar_tpu.pipeline.overlap import (dedupe_extents,
                                            las_from_extents)
    from damar_tpu.formats.las import LasFile
    exts, counts, total = distributed_overlap(
        blocks, cfg, mesh=mesh, seed_cap=seed_cap, hit_cap=hit_cap)
    n = len(blocks)
    if (counts[:, :, 0] >= seed_cap).any():
        raise ValueError(
            f"ring sweep hit seed_cap={seed_cap} on "
            f"{int((counts[:, :, 0] >= seed_cap).sum())} rotations — "
            "truncated extents would silently lose overlaps; rerun "
            "with a larger seed_cap")
    # per-block host-side state computed ONCE (rc is a per-read Python
    # loop and uploads are real transfers; a per-pair recompute would
    # be O(n^2) in both)
    rc_blocks = [revcomp_block(b) for b in blocks]
    dev_bases = [jnp.asarray(b.bases) for b in blocks]
    out = []
    for d in range(n):
        parts = []
        for j in range(n):
            b = (d - j) % n
            rows = exts[d, j]
            rows = rows[rows[:, 0] >= 0].astype(np.int32)
            if not len(rows):
                continue
            kept_parts = []
            for comp in (0, 1):
                sel = rows[rows[:, 2] == comp]
                if not len(sel):
                    continue
                ext = {"aread": sel[:, 0], "bread": sel[:, 1],
                       "abpos": sel[:, 3], "aepos": sel[:, 4],
                       "bbpos": sel[:, 5], "bepos": sel[:, 6],
                       "diffs": np.zeros(len(sel), np.int32),
                       "n": len(sel)}
                kept = dedupe_extents(ext, cfg.min_len,
                                      max_err=1.0 - cfg.err)
                kept["comp"] = bool(comp)
                if kept["n"]:
                    kept_parts.append(kept)
            if kept_parts:
                la, _ = las_from_extents(blocks[d], blocks[b],
                                         kept_parts, cfg,
                                         emit_mirrors=False,
                                         a_bases_d=dev_bases[d],
                                         blk_b_rc=rc_blocks[b])
                parts.append(la)
        las = LasFile.concat(parts) if parts \
            else LasFile(cfg.tspace, [])
        las.sort()
        out.append(las)
    return out, counts, total


# --- multi-host scale-out (SURVEY.md §2.9-2.10, §5.8) -----------------------

def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """jax.distributed initialization for a multi-host pod slice.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    when arguments are omitted (the launcher contract of a SLURM-style
    array, mirroring how the reference's HPC planners parameterize
    array elements).  Returns this host's process index; a no-op 0 in
    single-process runs so all callers can be launcher-agnostic.
    """
    import os
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return 0
    num_processes = int(num_processes
                        or os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = int(process_id
                     if process_id is not None
                     else os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def block_pair_matrix(nblocks: int) -> list[tuple[int, int]]:
    """The reference's HPC.daligner job matrix: all unordered block
    pairs (i <= j), i.e. N(N+1)/2 comparisons."""
    return [(i, j) for i in range(1, nblocks + 1)
            for j in range(i, nblocks + 1)]


def host_pair_slice(nblocks: int, nhosts: int, host_id: int
                    ) -> list[tuple[int, int]]:
    """Deterministic partition of the block-pair matrix across hosts.

    Pairs are dealt round-robin in matrix order so every host gets an
    equal mix of cheap (sparse) and expensive (self/dense) pairs —
    contiguous chunks would give host 0 all the early self-heavy
    rows.  Union over hosts is the full matrix; slices are disjoint.
    The shared filesystem remains the only rendezvous, exactly like
    the reference: each host writes its pairs' .las shards and marks
    the per-pair manifest, and any host (or a later rerun) performs
    the merge once all pairs are done.
    """
    if not (0 <= host_id < nhosts):
        raise ValueError(f"host_id {host_id} not in [0, {nhosts})")
    return block_pair_matrix(nblocks)[host_id::nhosts]

"""Distributed overlap: A-shards resident, B-shards ring-rotated.

The reference parallelizes by a block-pair job matrix over cluster
nodes with a shared filesystem (SURVEY.md §2.9); the TPU-native design
holds one A-shard resident per chip and rotates B-shards around the
mesh ring with lax.ppermute so every (A, B) block pair meets on some
chip after n_devices rotations — no host round-trips, collectives ride
ICI.  Per-rotation outputs are fixed-capacity seed/extent tensors plus
psum'd counters.

This module is exercised on virtual CPU meshes in tests and by the
driver's dryrun; on a real pod slice the same code runs unchanged over
a jax.distributed-initialized mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from damar_tpu.core.config import OverlapConfig
from damar_tpu.ops.kmers import kmer_codes
from damar_tpu.ops.wave import extend_wave


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


def ring_overlap_step(cfg: OverlapConfig, axis: str, n_shards: int,
                      seed_cap: int, hit_cap: int):
    """Build the per-device function for one full ring sweep.

    Returns fn(a_bases, a_rid, a_starts, b_bases, b_rid, b_starts) ->
    (extents [n_shards, seed_cap, 6], counts [n_shards, 2]) where
    extents rows are (aread, bread_local, abpos, aepos, bbpos, bepos)
    per originating shard rotation (bread is local to the B shard that
    was resident at that rotation; callers map via rotation index).

    Designed for use under shard_map: every device runs this on its
    resident A-shard while B rotates.
    """
    from damar_tpu.ops.seeding import match_hits, diagonal_filter

    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local_pair(a_bases, a_rid, a_starts, b_bases, b_rid, b_starts,
                   is_self):
        """Seeds + extension for the currently-resident (A, B) pair.
        is_self (traced bool): this rotation pairs the shard with its
        own block — suppress read-vs-itself seeds."""
        a_codes, a_pos = _index(a_bases, a_rid)
        b_codes, b_pos = _index(b_bases, b_rid)
        apos, bpos, nhits, _tot = match_hits(
            a_codes, a_pos, b_codes, b_pos, k=cfg.kmer, hit_cap=hit_cap,
            max_count=cfg.max_kmer_count or 128)
        nr_b = b_starts.shape[0]  # nreads+1 upper bound (static)
        pos_bits = int(a_bases.shape[0] - 1).bit_length()
        from damar_tpu.ops.seeding import quantize_bits
        ar, br, sap, sbp, cov, nseeds, _ts = diagonal_filter(
            apos, bpos, nhits, a_rid, b_rid, nr_b,
            pos_bits=pos_bits, read_bits=quantize_bits(nr_b),
            band_shift=cfg.band_shift, hit_min=cfg.hit_min,
            kmer=cfg.kmer, seed_cap=seed_cap,
            upper_only=False, suppress_equal=is_self)
        live = jnp.arange(seed_cap) < nseeds
        ar_c = jnp.maximum(ar, 0)
        br_c = jnp.maximum(br, 0)
        astart = a_starts[ar_c]
        aend = a_starts[ar_c + 1]
        bstart = b_starts[br_c]
        bend = b_starts[br_c + 1]
        sap_c = jnp.clip(sap, 0, None)
        sbp_c = jnp.clip(sbp, 0, None)
        kw = dict(W=cfg.band_width, max_rows=cfg.max_read_len,
                  diff_cost=cfg.diff_cost, xdrop=cfg.xdrop)
        fva, fvb, fd, _ = extend_wave(
            a_bases, b_bases, sap_c, sbp_c,
            jnp.where(live, aend - sap_c, 0),
            jnp.where(live, bend - sbp_c, 0), reverse=False, **kw)
        rva, rvb, rd, _ = extend_wave(
            a_bases, b_bases, sap_c, sbp_c,
            jnp.where(live, sap_c - astart, 0),
            jnp.where(live, sbp_c - bstart, 0), reverse=True, **kw)
        ext = jnp.stack([
            ar, br,
            sap_c - astart - rva, sap_c - astart + fva,
            sbp_c - bstart - rvb, sbp_c - bstart + fvb], axis=1)
        ok = live & ((fva + rva) >= cfg.min_len)
        ext = jnp.where(ok[:, None], ext, -1)
        return ext, jnp.stack([nseeds, ok.sum().astype(jnp.int32)])

    def _index(bases, rid):
        from damar_tpu.ops.sort import radix_sort_bits
        codes, _ = kmer_codes(bases, rid, cfg.kmer)
        pos = jnp.arange(bases.shape[0], dtype=jnp.int32)
        cs, (ps,) = radix_sort_bits(codes, (pos,), 2 * cfg.kmer + 1)
        return cs, ps

    def sweep(a_bases, a_rid, a_starts, b_bases, b_rid, b_starts):
        # squeeze the sharded leading axis (shard_map gives [1, ...])
        a_bases, a_rid, a_starts = (a_bases[0], a_rid[0], a_starts[0])
        b_bases, b_rid, b_starts = (b_bases[0], b_rid[0], b_starts[0])

        my = jax.lax.axis_index(axis)

        def rot_body(i, carry):
            bb, br_, bs, exts, counts = carry
            # ppermute sends right / receives left: at rotation i the
            # device holds B-shard (my - i) % n; i == 0 pairs a block
            # with itself
            ext, cnt = local_pair(a_bases, a_rid, a_starts, bb, br_, bs,
                                  i == 0)
            exts = jax.lax.dynamic_update_index_in_dim(exts, ext, i, 0)
            counts = jax.lax.dynamic_update_index_in_dim(counts, cnt, i, 0)
            bb = jax.lax.ppermute(bb, axis, perm)
            br_ = jax.lax.ppermute(br_, axis, perm)
            bs = jax.lax.ppermute(bs, axis, perm)
            return bb, br_, bs, exts, counts

        exts0 = jnp.full((n_shards, seed_cap, 6), -1, jnp.int32)
        counts0 = jnp.zeros((n_shards, 2), jnp.int32)
        _, _, _, exts, counts = jax.lax.fori_loop(
            0, n_shards, rot_body,
            (b_bases, b_rid, b_starts, exts0, counts0))
        total = jax.lax.psum(counts.sum(0), axis)
        return exts[None], counts[None], total[None]

    return sweep


def distributed_overlap(blocks: list, cfg: OverlapConfig,
                        mesh: Mesh | None = None, seed_cap: int = 4096,
                        hit_cap: int = 1 << 18):
    """All-vs-all overlap of n blocks over an n-device mesh: one ring
    sweep; returns per-device per-rotation extents + global counters.

    The j-th rotation on device d processed B-shard (d - j) % n, so
    extents[d, j] pairs A-block d with B-block (d - j) % n.
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

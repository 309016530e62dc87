"""Masking pipeline (L4, SURVEY.md §2.5): DUST low-complexity, tandem
(datander/TANmask) and repeat (REPmask/LArepeat) tracks.

All tracks are per-read flat [b,e,...] interval lists in read-local
coordinates, stored via formats.tracks; they feed back into seeding as
soft masks (kmers starting inside masked intervals are suppressed,
the daligner -m path).
"""
from __future__ import annotations

import numpy as np

from damar_tpu.core.blocks import ReadBlock
from damar_tpu.core.config import MaskConfig, OverlapConfig
from damar_tpu.formats.las import LasFile
from damar_tpu.formats.tracks import Track, merge_interval_lists
from damar_tpu.utils.dust import dust_block


def dust_track(seqs: list[np.ndarray], cfg: MaskConfig) -> Track:
    """DBdust equivalent over a list of read sequences."""
    return Track(name="dust",
                 data=dust_block(seqs, cfg.dust_window, cfg.dust_thresh))


def tandem_track(blk: ReadBlock, ocfg: OverlapConfig, cfg: MaskConfig,
                 max_period: int = 2000) -> Track:
    """datander + TANmask equivalent for one block.

    Self-seeds on positive diagonals are extended with the standard
    wave; each alignment of a read against itself at offset p covers
    the tandem interval [bbpos, aepos) (the union of the two copies).
    Intervals >= tan_min_len are merged per read.
    """
    from damar_tpu.ops.seeding import find_tandem_seeds
    from damar_tpu.pipeline.overlap import (_host_compute_enabled,
                                            extend_seeds)

    if _host_compute_enabled():
        from damar_tpu.ops.seeding_host import find_tandem_seeds_host
        seeds = find_tandem_seeds_host(blk, ocfg,
                                       max_period=max_period)
    else:
        seeds = find_tandem_seeds(blk, ocfg, max_period=max_period)
    exts = extend_seeds(blk, blk, seeds, ocfg, comp=False)
    per_read: dict[int, list] = {}
    sel = np.nonzero(exts["aread"] == exts["bread"])[0]
    lo_v = np.minimum(exts["abpos"][sel], exts["bbpos"][sel])
    hi_v = np.maximum(exts["aepos"][sel], exts["bepos"][sel])
    for j, lo, hi in zip(exts["aread"][sel], lo_v, hi_v):
        if hi - lo >= cfg.tan_min_len:
            per_read.setdefault(int(j), []).append((int(lo), int(hi)))
    data = []
    for j in range(blk.nreads):
        ivs = per_read.get(j)
        if not ivs:
            data.append(np.zeros(0, np.int32))
            continue
        acc = np.zeros(0, np.int32)
        for lo, hi in sorted(ivs):
            acc = merge_interval_lists(acc, np.array([lo, hi], np.int32))
        data.append(acc)
    return Track(name="tan", data=data)


def coverage_intervals(events: list[tuple[int, int]], rlen: int,
                       threshold: int) -> np.ndarray:
    """Intervals of a read where alignment coverage >= threshold, from
    (abpos, aepos) event pairs."""
    if not events:
        return np.zeros(0, np.int32)
    pts = []
    for b, e in events:
        pts.append((b, 1))
        pts.append((e, -1))
    pts.sort()
    out = []
    cov = 0
    start = None
    for x, d in pts:
        cov += d
        if cov >= threshold and start is None:
            start = x
        elif cov < threshold and start is not None:
            if x > start:
                out.append((start, min(x, rlen)))
            start = None
    if start is not None:
        out.append((start, rlen))
    return np.array(out, np.int32).reshape(-1)


def repeat_track_coverage(las: LasFile, rlen_of: np.ndarray,
                          read_index: dict[int, int], nreads: int,
                          cov: int, name: str = "rep") -> Track:
    """REPmask equivalent: A-read intervals covered by >= cov
    alignments become repeat intervals.

    read_index maps absolute read id -> local track index.
    """
    ev: list[list[tuple[int, int]]] = [[] for _ in range(nreads)]
    for o in las.overlaps:
        j = read_index.get(o.aread)
        if j is not None:
            ev[j].append((o.abpos, o.aepos))
    data = [coverage_intervals(ev[j], int(rlen_of[j]), cov)
            for j in range(nreads)]
    return Track(name=name, data=data)


def repeat_track_relative(las: LasFile, rlen_of: np.ndarray,
                          read_index: dict[int, int], nreads: int,
                          low_mult: float = 1.5, high_mult: float = 2.0,
                          name: str = "repeats") -> Track:
    """LArepeat equivalent: repeat threshold relative to the dataset's
    expected coverage (estimated as the median per-base coverage of
    reads with any alignment)."""
    ev: list[list[tuple[int, int]]] = [[] for _ in range(nreads)]
    for o in las.overlaps:
        j = read_index.get(o.aread)
        if j is not None:
            ev[j].append((o.abpos, o.aepos))
    per_read_cov = []
    for j in range(nreads):
        if ev[j] and rlen_of[j] > 0:
            tot = sum(e - b for b, e in ev[j])
            per_read_cov.append(tot / int(rlen_of[j]))
    est = float(np.median(per_read_cov)) if per_read_cov else 0.0
    thr = max(2, int(round(est * high_mult)))
    data = [coverage_intervals(ev[j], int(rlen_of[j]), thr)
            for j in range(nreads)]
    t = Track(name=name, data=data)
    t.expected_coverage = est  # type: ignore[attr-defined]
    return t

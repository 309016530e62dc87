"""Scrubbing pipeline (L5, SURVEY.md §2.6, MARVEL lineage:
LAstitch/LAq/LAfix/LAgap/LAfilter — upstream-path citations, reference
mount empty).

Piles (all alignments with the same A-read, the pass.c framework's
unit) are processed as dicts of numpy arrays.  Quality is
segment-granular: segment s of read r is the A interval
[s*tspace, (s+1)*tspace), and every covering alignment contributes its
trace diffs for exactly that absolute segment — possible because the
trace kernel commits at absolute tspace boundaries.

Patching (LAfix, the lineage's signature move) replaces bad-quality
segments with the spanning sequence of the best covering B read,
mapped through trace points, and splits reads at uncovered gaps.
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from damar_tpu.core.config import ScrubConfig
from damar_tpu.formats.las import LasFile, Overlap, n_segments
from damar_tpu.formats.oflags import (
    OVL_COMP, OVL_CONT, OVL_DISCARD, OVL_GAP, OVL_LOCAL, OVL_REPEAT,
    OVL_STITCH)
from damar_tpu.formats.tracks import Track

Q_NOCOV = 255  # quality value for uncovered segments


def piles(las: LasFile) -> dict[int, list[Overlap]]:
    out: dict[int, list[Overlap]] = defaultdict(list)
    for o in las.overlaps:
        out[o.aread].append(o)
    return out


# --- LAstitch ---------------------------------------------------------------

def stitch_las(las: LasFile, fuzz: int = 100) -> tuple[LasFile, list[Overlap]]:
    """Merge fragments of the same (a, b, comp) pair separated by a
    small unaligned gap (alignment broken at a noisy patch).

    Returns (stitched las, list of merged records needing trace
    recompute — their .trace is a placeholder and must be rebuilt by
    the caller via the trace kernel before writing to disk).
    """
    groups: dict[tuple, list[Overlap]] = defaultdict(list)
    for o in las.overlaps:
        groups[(o.aread, o.bread, o.flags & OVL_COMP)].append(o)
    out: list[Overlap] = []
    needs_trace: list[Overlap] = []
    for g in groups.values():
        g.sort(key=lambda o: o.abpos)
        cur = g[0]
        for nxt in g[1:]:
            agap = nxt.abpos - cur.aepos
            bgap = nxt.bbpos - cur.bepos
            if -fuzz <= agap <= fuzz and -fuzz <= bgap <= fuzz \
                    and nxt.aepos > cur.aepos and nxt.bepos > cur.bepos:
                cur = Overlap(
                    aread=cur.aread, bread=cur.bread,
                    flags=cur.flags | OVL_STITCH,
                    abpos=cur.abpos, aepos=nxt.aepos,
                    bbpos=cur.bbpos, bepos=nxt.bepos,
                    diffs=cur.diffs + nxt.diffs + abs(agap) + abs(bgap),
                    trace=np.zeros((0, 2), np.int32))
                if cur not in needs_trace:
                    needs_trace.append(cur)
            else:
                out.append(cur)
                cur = nxt
        out.append(cur)
    res = LasFile(tspace=las.tspace, overlaps=out)
    res.sort()
    return res, needs_trace


# --- LAq --------------------------------------------------------------------

def q_and_trim(las: LasFile, rlen_of: dict[int, int], cfg: ScrubConfig
               ) -> tuple[dict[int, np.ndarray], dict[int, tuple[int, int]]]:
    """Per-read segment quality + trim interval (LAq equivalent).

    quality[seg] = min diffs over alignments whose trace covers the
    FULL absolute segment (partial first/last segments don't count);
    Q_NOCOV where no alignment covers.  trim = widest interval whose
    first/last segments are good (q <= q_good), in bases.
    """
    ts = las.tspace
    qual: dict[int, np.ndarray] = {}
    for aread, rl in rlen_of.items():
        qual[aread] = np.full((rl + ts - 1) // ts, Q_NOCOV, np.int32)
    for o in las.overlaps:
        q = qual.get(o.aread)
        if q is None:
            continue
        s0 = o.abpos // ts
        nseg = len(o.trace)
        for k in range(nseg):
            seg = s0 + k
            a_lo = max(o.abpos, seg * ts)
            a_hi = min(o.aepos, (seg + 1) * ts)
            if a_hi - a_lo == ts:            # full segment only
                d = int(o.trace[k, 0])
                if d < q[seg]:
                    q[seg] = d
    trim: dict[int, tuple[int, int]] = {}
    for aread, q in qual.items():
        rl = rlen_of[aread]
        good = np.nonzero(q <= cfg.q_good)[0]
        if len(good) == 0:
            trim[aread] = (0, 0)
        else:
            tb = int(good[0]) * ts
            te = min((int(good[-1]) + 1) * ts, rl)
            trim[aread] = (tb, te)
    return qual, trim


def q_track(qual: dict[int, np.ndarray], nreads: int,
            index_of: dict[int, int]) -> Track:
    data = [np.zeros(0, np.int32)] * nreads
    for aread, q in qual.items():
        data[index_of[aread]] = q.astype(np.int32)
    return Track(name="q", data=data)


def trim_track(trim: dict[int, tuple[int, int]], nreads: int,
               index_of: dict[int, int]) -> Track:
    data = [np.zeros(0, np.int32)] * nreads
    for aread, (tb, te) in trim.items():
        data[index_of[aread]] = np.array([tb, te], np.int32)
    return Track(name="trim", data=data)


# --- LAfix (patch) ----------------------------------------------------------

@dataclass
class PatchedRead:
    src_read: int
    part: int
    seq: np.ndarray
    src_interval: tuple[int, int]   # A interval the part came from


def _b_range_for_segments(o: Overlap, ts: int, seg_lo: int, seg_hi: int
                          ) -> tuple[int, int]:
    """B interval spanned by absolute segments [seg_lo, seg_hi) of this
    alignment, via cumulative trace b-spans."""
    s0 = o.abpos // ts
    cum = np.concatenate([[0], np.cumsum(o.trace[:, 1])])
    lo = o.bbpos + int(cum[seg_lo - s0])
    hi = o.bbpos + int(cum[seg_hi - s0])
    return lo, hi


def fix_reads(las: LasFile, seqs_of, rlen_of: dict[int, int],
              qual: dict[int, np.ndarray], cfg: ScrubConfig,
              reads_to_fix: list[int] | None = None) -> list[PatchedRead]:
    """Patch each read's bad segments from its best covering alignment
    (LAfix equivalent) and split at uncovered gaps.

    seqs_of(read_id, comp) -> base codes of that read (comp: reverse
    complement, used because COMP alignments express B in complement
    coordinates).  Returns patched read parts within trim intervals.
    """
    ts = las.tspace
    pls = piles(las)
    out: list[PatchedRead] = []
    targets = reads_to_fix if reads_to_fix is not None else sorted(qual)
    for aread in targets:
        q = qual[aread]
        rl = rlen_of[aread]
        aseq = seqs_of(aread, False)
        nseg = len(q)
        # best covering alignment per full segment
        best: list[Overlap | None] = [None] * nseg
        bestd = np.full(nseg, 1 << 30)
        for o in pls.get(aread, []):
            s0 = o.abpos // ts
            for k in range(len(o.trace)):
                seg = s0 + k
                a_lo = max(o.abpos, seg * ts)
                a_hi = min(o.aepos, (seg + 1) * ts)
                if a_hi - a_lo == ts and int(o.trace[k, 0]) < bestd[seg]:
                    bestd[seg] = int(o.trace[k, 0])
                    best[seg] = o
        # build patched sequence segment by segment; split at gaps
        parts: list[np.ndarray] = []
        cur: list[np.ndarray] = []
        cur_lo = None
        last_seg_end = 0

        def flush(endpos):
            nonlocal cur, cur_lo
            if cur:
                seq = np.concatenate(cur)
                if len(seq) >= cfg.min_trim_len:
                    out.append(PatchedRead(
                        src_read=aread, part=len([
                            p for p in out if p.src_read == aread]),
                        seq=seq, src_interval=(cur_lo, endpos)))
            cur, cur_lo = [], None

        for seg in range(nseg):
            a_lo = seg * ts
            a_hi = min((seg + 1) * ts, rl)
            if q[seg] == Q_NOCOV and bestd[seg] >= (1 << 30):
                # uncovered: break the read here
                flush(a_lo)
                continue
            if cur_lo is None:
                cur_lo = a_lo
            if q[seg] > cfg.q_bad and best[seg] is not None:
                o = best[seg]
                blo, bhi = _b_range_for_segments(o, ts, seg, seg + 1)
                bseq = seqs_of(o.bread, bool(o.flags & OVL_COMP))
                cur.append(bseq[blo:bhi])
            else:
                cur.append(aseq[a_lo:a_hi])
            last_seg_end = a_hi
        flush(last_seg_end)
    return out


# --- LAgap ------------------------------------------------------------------

def gap_breaks(las: LasFile, rlen_of: dict[int, int], cfg: ScrubConfig
               ) -> dict[int, list[int]]:
    """Detect consistent pile breaks (chimeric junctions / missed
    adapters): positions where alignment coverage drops below
    gap_min_cov while both sides are covered (LAgap equivalent).
    Returns per-read break positions."""
    breaks: dict[int, list[int]] = {}
    pls = piles(las)
    for aread, rl in rlen_of.items():
        evs = [(o.abpos, o.aepos) for o in pls.get(aread, [])]
        if not evs:
            continue
        pts = sorted([(b, 1) for b, _ in evs] + [(e, -1) for _, e in evs])
        cov = 0
        lows = []
        last_x = 0
        for x, d in pts:
            if cov < cfg.gap_min_cov and 0 < last_x < rl and x > last_x:
                lows.append((last_x, x))
            cov += d
            last_x = x
        # a low interval strictly inside the read = break candidate
        bs = [(lo + hi) // 2 for lo, hi in lows
              if lo > rl * 0.05 and hi < rl * 0.95]
        if bs:
            breaks[aread] = bs
    return breaks


# --- LAfilter ---------------------------------------------------------------

def classify(o: Overlap, alen: int, blen: int, fuzz: int = 25) -> str:
    """Dovetail classification in trimmed coordinates."""
    a_l = o.abpos <= fuzz
    a_r = o.aepos >= alen - fuzz
    b_l = o.bbpos <= fuzz
    b_r = o.bepos >= blen - fuzz
    if a_l and a_r:
        return "a_contained"
    if b_l and b_r:
        return "b_contained"
    if (a_r and b_l) or (a_l and b_r):
        return "dovetail"
    if a_l or a_r or b_l or b_r:
        return "partial"
    return "local"


def filter_las(las: LasFile, rlen_of: dict[int, int],
               cfg: ScrubConfig, repeat_iv: dict[int, np.ndarray] | None
               = None) -> LasFile:
    """LAfilter equivalent: flag discard on local, short, high-error,
    and repeat-only alignments; keep dovetails + containments."""
    out = []
    for o in las.overlaps:
        alen = rlen_of.get(o.aread)
        blen = rlen_of.get(o.bread)
        if alen is None or blen is None:
            continue
        flags = o.flags
        olen = o.aepos - o.abpos
        kind = classify(o, alen, blen, cfg.filter_fuzz)
        if olen < cfg.filter_min_len:
            flags |= OVL_DISCARD
        if o.diffs > cfg.filter_max_diff * olen:
            flags |= OVL_DISCARD
        if kind == "local":
            flags |= OVL_LOCAL | OVL_DISCARD
        elif kind == "partial":
            flags |= OVL_DISCARD | OVL_GAP
        elif kind in ("a_contained", "b_contained"):
            flags |= OVL_CONT
        if repeat_iv is not None:
            iv = repeat_iv.get(o.aread)
            if iv is not None and len(iv):
                p = iv.reshape(-1, 2)
                inside = ((p[:, 0] <= o.abpos) & (o.aepos <= p[:, 1])).any()
                if inside:
                    flags |= OVL_REPEAT | OVL_DISCARD
        out.append(Overlap(aread=o.aread, bread=o.bread, flags=flags,
                           abpos=o.abpos, aepos=o.aepos, bbpos=o.bbpos,
                           bepos=o.bepos, diffs=o.diffs, trace=o.trace))
    res = LasFile(tspace=las.tspace, overlaps=out)
    res.sort()
    return res

"""Local-alignment (.las) file codec.

Layout follows the Dazzler lineage (dalign/align.h Write_Overlap /
Read_Overlap — upstream-path citation, reference mount empty):

  header:  int64 novl;  int32 tspace;  (tspace = trace-point spacing)
  record:  the Overlap struct minus its leading trace pointer, i.e.
           40 bytes LE: tlen,diffs,abpos,bbpos,aepos,bepos (i32 x6),
           flags (u32), aread (i32), bread (i32), 4 pad bytes;
           followed by the trace array: tlen bytes (u8) if
           tspace <= TRACE_XOVR(=125), else tlen int16s.

The trace array is pairs per trace-point segment: (diffs_in_segment,
b_bases_spanned).  Segments are delimited by ABSOLUTE multiples of
tspace in A coordinates: the first/last segments are partial.  tlen is
2 * number_of_segments.

Records for a given block pair are sorted by (aread, bread, COMP bit,
abpos) — the order LAsort produces and every pile tool expects.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from damar_tpu.formats.oflags import OVL_COMP, flag_str

TRACE_XOVR = 125

OVL_RECORD_DTYPE = np.dtype({
    "names": ["tlen", "diffs", "abpos", "bbpos", "aepos", "bepos",
              "flags", "aread", "bread"],
    "formats": ["<i4"] * 6 + ["<u4", "<i4", "<i4"],
    "offsets": [0, 4, 8, 12, 16, 20, 24, 28, 32],
    "itemsize": 40,
})


@dataclass
class Overlap:
    aread: int
    bread: int
    flags: int
    abpos: int
    aepos: int
    bbpos: int
    bepos: int
    diffs: int
    trace: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.int32))
    # trace: (nseg, 2) int array of (diffs, bspan) per segment

    @property
    def comp(self) -> bool:
        return bool(self.flags & OVL_COMP)

    def alen(self) -> int:
        return self.aepos - self.abpos

    def blen(self) -> int:
        return self.bepos - self.bbpos

    def __repr__(self):
        return (f"Overlap(a={self.aread} b={self.bread}"
                f"{'c' if self.comp else 'n'} "
                f"A[{self.abpos},{self.aepos}) B[{self.bbpos},{self.bepos}) "
                f"d={self.diffs} [{flag_str(self.flags)}])")


@dataclass
class LasFile:
    tspace: int
    overlaps: list[Overlap]

    @property
    def novl(self) -> int:
        return len(self.overlaps)

    @property
    def small(self) -> bool:
        return self.tspace <= TRACE_XOVR

    def sort(self) -> None:
        """LAsort order: (aread, bread, comp, abpos)."""
        self.overlaps.sort(
            key=lambda o: (o.aread, o.bread, o.flags & OVL_COMP, o.abpos,
                           o.aepos, o.bbpos))


def n_segments(abpos: int, aepos: int, tspace: int) -> int:
    """Number of trace-point segments of A-interval [abpos, aepos)."""
    if aepos <= abpos:
        return 0
    return (aepos - 1) // tspace - abpos // tspace + 1


def write_las(path: str, las: LasFile) -> None:
    small = las.small
    with open(path, "wb") as f:
        f.write(np.int64(las.novl).tobytes())
        f.write(np.int32(las.tspace).tobytes())
        for o in las.overlaps:
            rec = np.zeros(1, dtype=OVL_RECORD_DTYPE)
            trace = np.asarray(o.trace, dtype=np.int32).reshape(-1, 2)
            tlen = 2 * len(trace)
            rec["tlen"] = tlen
            rec["diffs"] = o.diffs
            rec["abpos"] = o.abpos
            rec["bbpos"] = o.bbpos
            rec["aepos"] = o.aepos
            rec["bepos"] = o.bepos
            rec["flags"] = o.flags
            rec["aread"] = o.aread
            rec["bread"] = o.bread
            f.write(rec.tobytes())
            flat = trace.reshape(-1)
            if flat.size and flat.min() < 0:
                raise ValueError(
                    f"negative trace value {flat.min()}; record {o}")
            if small:
                if flat.size and flat.max() > 255:
                    raise ValueError(
                        f"trace value {flat.max()} exceeds u8 for tspace "
                        f"{las.tspace}; record {o}")
                f.write(flat.astype(np.uint8).tobytes())
            else:
                f.write(flat.astype(np.int16).tobytes())


def read_las(path: str) -> LasFile:
    raw = np.fromfile(path, dtype=np.uint8)
    novl = int(raw[:8].view("<i8")[0])
    tspace = int(raw[8:12].view("<i4")[0])
    small = tspace <= TRACE_XOVR
    pos = 12
    out: list[Overlap] = []
    for _ in range(novl):
        rec = raw[pos:pos + 40].view(OVL_RECORD_DTYPE)[0]
        pos += 40
        tlen = int(rec["tlen"])
        if small:
            flat = raw[pos:pos + tlen].astype(np.int32)
            pos += tlen
        else:
            flat = raw[pos:pos + 2 * tlen].view("<i2").astype(np.int32)
            pos += 2 * tlen
        out.append(Overlap(
            aread=int(rec["aread"]), bread=int(rec["bread"]),
            flags=int(rec["flags"]), abpos=int(rec["abpos"]),
            aepos=int(rec["aepos"]), bbpos=int(rec["bbpos"]),
            bepos=int(rec["bepos"]), diffs=int(rec["diffs"]),
            trace=flat.reshape(-1, 2),
        ))
    if pos != len(raw):
        raise ValueError(f"{path}: {len(raw) - pos} trailing bytes")
    return LasFile(tspace=tspace, overlaps=out)


# --- validation (LAcheck equivalent) ---------------------------------------

def check_las(las: LasFile, rlen_a, rlen_b=None, sorted_order: bool = True
              ) -> list[str]:
    """Structural validation of a .las against read lengths (LAcheck).

    rlen_a/rlen_b: arrays mapping absolute read id -> length (b defaults
    to a for intra-DB comparisons).  Returns a list of problem strings
    (empty = clean).  Checks: coordinate bounds, trace segment count and
    b-span consistency, diffs consistency, sort order.
    """
    if rlen_b is None:
        rlen_b = rlen_a
    errs: list[str] = []
    prev_key = None
    for n, o in enumerate(las.overlaps):
        la = int(rlen_a[o.aread])
        lb = int(rlen_b[o.bread])
        if not (0 <= o.abpos < o.aepos <= la):
            errs.append(f"[{n}] bad A interval {o.abpos},{o.aepos} (len {la})")
            continue
        if not (0 <= o.bbpos < o.bepos <= lb):
            errs.append(f"[{n}] bad B interval {o.bbpos},{o.bepos} (len {lb})")
            continue
        nseg = n_segments(o.abpos, o.aepos, las.tspace)
        if len(o.trace) != nseg:
            errs.append(f"[{n}] trace has {len(o.trace)} segments, expect {nseg}")
            continue
        bspan = int(o.trace[:, 1].sum())
        if bspan != o.bepos - o.bbpos:
            errs.append(f"[{n}] trace b-span {bspan} != {o.bepos - o.bbpos}")
        tdiffs = int(o.trace[:, 0].sum())
        if tdiffs != o.diffs:
            errs.append(f"[{n}] trace diffs {tdiffs} != record diffs {o.diffs}")
        # each segment's diffs must allow its a/b span discrepancy
        ts = las.tspace
        a0 = o.abpos
        for s in range(nseg):
            a1 = min((a0 // ts + 1) * ts, o.aepos)
            d, bs = int(o.trace[s, 0]), int(o.trace[s, 1])
            if d < abs((a1 - a0) - bs):
                errs.append(f"[{n}] seg {s}: diffs {d} < |aspan-bspan| "
                            f"{abs((a1 - a0) - bs)}")
                break
            a0 = a1
        if sorted_order:
            key = (o.aread, o.bread, o.flags & OVL_COMP, o.abpos)
            if prev_key is not None and key < prev_key:
                errs.append(f"[{n}] sort order violation {prev_key} -> {key}")
            prev_key = key
    return errs


# --- merge / sort / cat (LAsort, LAmerge, LAcat equivalents) ---------------

def sort_las_file(path: str, out: str | None = None) -> None:
    las = read_las(path)
    las.sort()
    write_las(out or path, las)


def merge_las(paths: list[str], out: str) -> None:
    """K-way merge of sorted .las files into one sorted file.

    The reference limits merge fan-in (~252 open files) and builds merge
    trees; here a full in-memory merge is fine for block-scale inputs,
    while remaining deterministic.
    """
    from damar_tpu import native
    if native.available() and native.las_merge(paths, out):
        return
    import heapq
    lases = [read_las(p) for p in paths]
    tspaces = {l.tspace for l in lases if l.novl} or {lases[0].tspace}
    if len(tspaces) != 1:
        raise ValueError(f"mixed tspace values {tspaces}")
    def keyed(l):
        for o in l.overlaps:
            yield ((o.aread, o.bread, o.flags & OVL_COMP, o.abpos,
                    o.aepos, o.bbpos), o)
    merged = [o for _, o in heapq.merge(*(keyed(l) for l in lases))]
    write_las(out, LasFile(tspace=tspaces.pop(), overlaps=merged))


def cat_las(paths: list[str], out: str) -> None:
    lases = [read_las(p) for p in paths]
    allov = [o for l in lases for o in l.overlaps]
    write_las(out, LasFile(tspace=lases[0].tspace, overlaps=allov))


def reconstruct_alignment(o: Overlap, aseq, bseq, tspace: int,
                          width: int = 80) -> str:
    """Render the base-level alignment of a record from its trace
    points (LAshow -a equivalent): each trace segment pair is
    re-aligned with a small banded DP (the trace guarantees the spans
    and diff counts; the lineage does the same Compute_Trace +
    Print_Alignment reconstruction).

    aseq: A read codes; bseq: B read codes ALREADY complemented when
    the record has the COMP flag (records store B' coordinates).
    """
    from damar_tpu.formats.fasta import decode_seq
    from damar_tpu.pipeline.consensus import banded_align_path
    a0, b0 = o.abpos, o.bbpos
    top, mid, bot = [], [], []
    for (d, bspan) in np.asarray(o.trace, dtype=np.int64):
        a1 = min((a0 // tspace + 1) * tspace, o.aepos)
        aw = aseq[a0:a1]
        bw = bseq[b0:b0 + bspan]
        path = banded_align_path(aw, bw, band=max(32, int(d) + 8),
                                 semiglobal=False)
        for op, i, j in path:
            if op == 0:
                top.append(decode_seq(aw[i:i + 1]))
                bot.append(decode_seq(bw[j:j + 1]))
                mid.append("|" if aw[i] == bw[j] else "*")
            elif op == 1:
                top.append(decode_seq(aw[i:i + 1]))
                bot.append("-")
                mid.append(" ")
            else:
                top.append("-")
                bot.append(decode_seq(bw[j:j + 1]))
                mid.append(" ")
        a0, b0 = a1, b0 + int(bspan)
    lines = []
    t, m, b = "".join(top), "".join(mid), "".join(bot)
    for k in range(0, len(t), width):
        lines.append(f"  A {t[k:k + width]}")
        lines.append(f"    {m[k:k + width]}")
        lines.append(f"  B {b[k:k + width]}")
        lines.append("")
    return "\n".join(lines)


def show_las(las: LasFile, limit: int | None = None) -> str:
    """Human-readable dump (LAshow header lines)."""
    lines = []
    for o in las.overlaps[:limit]:
        c = "c" if o.comp else "n"
        lines.append(
            f"{o.aread:7d} {o.bread:7d} {c} "
            f"[{o.abpos:7d}..{o.aepos:7d}] x [{o.bbpos:7d}..{o.bepos:7d}] "
            f"( {o.diffs} diffs, {len(o.trace)} tps )")
    return "\n".join(lines)

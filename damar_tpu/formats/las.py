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

Two representations coexist:

  * `Overlap` objects (one per record) — the API every pile/scrub tool
    consumes and mutates;
  * `LasColumns` — a struct-of-arrays form (headers [n,10] int32 in
    file record order + raw file-encoded trace bytes + byte offsets)
    used by the block-scale hot paths (overlap emission, sort, merge,
    file IO), where 10^5-10^6 records per block pair make per-record
    Python objects the bottleneck.

`LasFile` holds either: columnar files materialize Overlap objects
lazily on first `.overlaps` access (and drop the columns, since the
objects may then be mutated).
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

# header column indices (int32 view of the 40-byte record)
H_TLEN, H_DIFFS, H_ABPOS, H_BBPOS, H_AEPOS, H_BEPOS = range(6)
H_FLAGS, H_AREAD, H_BREAD, H_PAD = 6, 7, 8, 9


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


def _gather_ragged(trace: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray, chunk_bytes: int = 1 << 25
                   ) -> np.ndarray:
    """Gather ragged byte runs trace[starts[i]:starts[i]+lens[i]] into
    one contiguous buffer.  Native C memcpy loop when available
    (~60x the numpy chunked form at block scale — the sort permute of
    a 50 Mbp pass's trace payload measured 2-3 s in numpy); the
    fallback processes bounded record chunks because the naive
    arange+repeat index arrays are int64, 8-16x the payload itself."""
    from damar_tpu import native
    if native.available():
        out = native.ragged_copy(trace, starts, lens)
        if out is not None:
            return out
    out_off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint8)
    n = len(lens)
    lo = 0
    while lo < n:
        hi = int(np.searchsorted(out_off, out_off[lo] + chunk_bytes,
                                 side="left"))
        hi = min(max(hi, lo + 1), n)
        ls = lens[lo:hi]
        total = int(out_off[hi] - out_off[lo])
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(out_off[lo:hi] - out_off[lo], ls)
               + np.repeat(starts[lo:hi], ls))
        out[out_off[lo]:out_off[hi]] = trace[pos]
        lo = hi
    return out


class LasColumns:
    """Columnar .las payload.

    headers:  [n, 10] int32, file record order (tlen, diffs, abpos,
              bbpos, aepos, bepos, flags, aread, bread, pad)
    trace:    raw trace payload bytes in FILE encoding (u8 pairs when
              small, <i2 pairs otherwise), all records concatenated
    offsets:  [n+1] int64 BYTE offsets of each record's payload
    """
    __slots__ = ("headers", "trace", "offsets")

    def __init__(self, headers: np.ndarray, trace: np.ndarray,
                 offsets: np.ndarray):
        self.headers = np.ascontiguousarray(headers, dtype=np.int32)
        self.trace = np.ascontiguousarray(trace, dtype=np.uint8)
        self.offsets = np.ascontiguousarray(offsets, dtype=np.int64)

    @classmethod
    def empty(cls) -> "LasColumns":
        return cls(np.zeros((0, 10), np.int32), np.zeros(0, np.uint8),
                   np.zeros(1, np.int64))

    @property
    def n(self) -> int:
        return self.headers.shape[0]

    def sort_order(self) -> np.ndarray:
        """LAsort order: (aread, bread, comp, abpos, aepos, bbpos)."""
        h = self.headers
        from damar_tpu.ops.sort import host_lexsort
        return host_lexsort((h[:, H_BBPOS], h[:, H_AEPOS], h[:, H_ABPOS],
                           h[:, H_FLAGS] & 1, h[:, H_BREAD],
                           h[:, H_AREAD]))

    def permute(self, order: np.ndarray) -> "LasColumns":
        lens = np.diff(self.offsets)
        starts = self.offsets[:-1][order]
        lens_o = lens[order]
        new_off = np.zeros(len(order) + 1, np.int64)
        np.cumsum(lens_o, out=new_off[1:])
        return LasColumns(self.headers[order],
                          _gather_ragged(self.trace, starts, lens_o),
                          new_off)

    @staticmethod
    def concat(parts: list["LasColumns"]) -> "LasColumns":
        parts = [p for p in parts if p.n]
        if not parts:
            return LasColumns.empty()
        headers = np.concatenate([p.headers for p in parts])
        trace = np.concatenate([p.trace for p in parts])
        offs = np.zeros(headers.shape[0] + 1, np.int64)
        np.cumsum(np.concatenate([np.diff(p.offsets) for p in parts]),
                  out=offs[1:])
        return LasColumns(headers, trace, offs)

    def a_spans(self) -> np.ndarray:
        return self.headers[:, H_AEPOS] - self.headers[:, H_ABPOS]


def encode_trace_columns(trace_rows: np.ndarray, seg_offsets: np.ndarray,
                         small: bool) -> tuple[np.ndarray, np.ndarray]:
    """Encode [total_segs, 2] int32 trace pairs (record i owns segment
    rows seg_offsets[i]:seg_offsets[i+1]) into file bytes + BYTE
    offsets.  Vectorized range validation replaces the per-record
    checks of the object writer."""
    flat = np.ascontiguousarray(trace_rows, dtype=np.int32)
    if flat.size:
        lo = int(flat.min())
        if lo < 0:
            raise ValueError(f"negative trace value {lo}")
        hi = int(flat.max())
        if small and hi > 255:
            raise ValueError(f"trace value {hi} exceeds u8")
        if not small and hi > 32767:
            raise ValueError(f"trace value {hi} exceeds i16")
    width = 2 if small else 4           # bytes per (pair element x2)/2
    if small:
        payload = flat.astype(np.uint8).reshape(-1).view(np.uint8)
    else:
        payload = flat.astype("<i2").reshape(-1).view(np.uint8)
    return payload, np.asarray(seg_offsets, dtype=np.int64) * width


def _decode_trace(raw: np.ndarray, small: bool) -> np.ndarray:
    if small:
        return raw.astype(np.int32).reshape(-1, 2)
    return raw.view("<i2").astype(np.int32).reshape(-1, 2)


def _columns_to_overlaps(cols: LasColumns, small: bool) -> list[Overlap]:
    h = cols.headers
    offs = cols.offsets
    tr = cols.trace
    out: list[Overlap] = []
    for i in range(cols.n):
        out.append(Overlap(
            aread=int(h[i, H_AREAD]), bread=int(h[i, H_BREAD]),
            flags=int(np.uint32(h[i, H_FLAGS])),
            abpos=int(h[i, H_ABPOS]), aepos=int(h[i, H_AEPOS]),
            bbpos=int(h[i, H_BBPOS]), bepos=int(h[i, H_BEPOS]),
            diffs=int(h[i, H_DIFFS]),
            trace=_decode_trace(tr[offs[i]:offs[i + 1]], small)))
    return out


def _overlaps_to_columns(ovls: list[Overlap], small: bool) -> LasColumns:
    n = len(ovls)
    headers = np.zeros((n, 10), np.int32)
    lens = np.zeros(n, np.int64)
    traces = []
    for i, o in enumerate(ovls):
        t = np.asarray(o.trace, dtype=np.int32).reshape(-1, 2)
        traces.append(t)
        lens[i] = t.shape[0]
        headers[i, :9] = (2 * t.shape[0], o.diffs, o.abpos, o.bbpos,
                          o.aepos, o.bepos, np.int32(np.uint32(o.flags)
                                                     .view(np.int32)),
                          o.aread, o.bread)
    rows = (np.concatenate(traces) if traces
            else np.zeros((0, 2), np.int32))
    seg_off = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=seg_off[1:])
    payload, offs = encode_trace_columns(rows, seg_off, small)
    return LasColumns(headers, payload, offs)


class LasFile:
    """A set of .las records: columnar (fast path) or object-backed.

    Construct with `overlaps=` (list of Overlap) or `columns=`
    (LasColumns).  `.overlaps` materializes objects from columns on
    first access and DROPS the columns (objects may be mutated);
    `.columns` returns the columnar form if still authoritative, else
    None.
    """

    def __init__(self, tspace: int, overlaps: list[Overlap] | None = None,
                 columns: LasColumns | None = None):
        self.tspace = int(tspace)
        if overlaps is None and columns is None:
            overlaps = []
        self._overlaps = overlaps
        self._columns = columns if overlaps is None else None

    @property
    def small(self) -> bool:
        return self.tspace <= TRACE_XOVR

    @property
    def columns(self) -> LasColumns | None:
        return self._columns

    @property
    def overlaps(self) -> list[Overlap]:
        if self._overlaps is None:
            self._overlaps = _columns_to_overlaps(self._columns, self.small)
            self._columns = None
        return self._overlaps

    @overlaps.setter
    def overlaps(self, v: list[Overlap]) -> None:
        self._overlaps = v
        self._columns = None

    @property
    def novl(self) -> int:
        if self._columns is not None:
            return self._columns.n
        return len(self._overlaps)

    def a_spans(self) -> np.ndarray:
        """A-interval lengths per record (no materialization)."""
        if self._columns is not None:
            return self._columns.a_spans()
        return np.array([o.aepos - o.abpos for o in self._overlaps],
                        np.int64)

    def sort(self) -> None:
        """LAsort order: (aread, bread, comp, abpos)."""
        if self._columns is not None:
            self._columns = self._columns.permute(
                self._columns.sort_order())
            return
        self._overlaps.sort(
            key=lambda o: (o.aread, o.bread, o.flags & OVL_COMP, o.abpos,
                           o.aepos, o.bbpos))

    @staticmethod
    def concat(parts: list["LasFile"]) -> "LasFile":
        """Concatenate record sets (columnar when every part still is)."""
        if not parts:
            return LasFile(tspace=100, overlaps=[])
        ts = {p.tspace for p in parts if p.novl} or {parts[0].tspace}
        if len(ts) != 1:
            raise ValueError(f"mixed tspace values {ts}")
        tspace = ts.pop()
        if all(p._columns is not None or not p.novl for p in parts):
            cols = LasColumns.concat(
                [p._columns for p in parts if p._columns is not None])
            return LasFile(tspace, columns=cols)
        small = tspace <= TRACE_XOVR
        allov: list[Overlap] = []
        for p in parts:
            allov.extend(p.overlaps)
        return LasFile(tspace, overlaps=allov)


def n_segments(abpos: int, aepos: int, tspace: int) -> int:
    """Number of trace-point segments of A-interval [abpos, aepos)."""
    if aepos <= abpos:
        return 0
    return (aepos - 1) // tspace - abpos // tspace + 1


def write_las(path: str, las: LasFile, _chunk: int = 1 << 25) -> None:
    """Bulk columnar writer: assembles the file image in bounded
    record chunks (interleaved header/payload scatter per chunk, a few
    syscalls total) — a per-record write loop costs ~10 us per record
    and a whole-file scatter builds int64 index arrays 8-16x the
    payload; block pairs emit 10^5-10^6 records."""
    cols = las.columns
    if cols is None:
        cols = _overlaps_to_columns(las.overlaps, las.small)
    n = cols.n
    lens = np.diff(cols.offsets)
    hdr = np.ascontiguousarray(cols.headers).view(np.uint8) \
        .reshape(max(n, 1), 40) if n else None
    CHUNK = _chunk
    with open(path, "wb") as f:
        f.write(np.int64(n).tobytes())
        f.write(np.int32(las.tspace).tobytes())
        lo = 0
        while lo < n:
            hi = int(np.searchsorted(cols.offsets,
                                     cols.offsets[lo] + CHUNK,
                                     side="left"))
            hi = min(max(hi, lo + 1), n)
            k = hi - lo
            pay = int(cols.offsets[hi] - cols.offsets[lo])
            buf = np.empty(40 * k + pay, np.uint8)
            rec_starts = (40 * np.arange(k, dtype=np.int64)
                          + cols.offsets[lo:hi] - cols.offsets[lo])
            dst = (rec_starts[:, None]
                   + np.arange(40, dtype=np.int64)).reshape(-1)
            buf[dst] = hdr[lo:hi].reshape(-1)
            if pay:
                ls = lens[lo:hi]
                shift = rec_starts + 40 - (cols.offsets[lo:hi]
                                           - cols.offsets[lo])
                tp = (np.arange(pay, dtype=np.int64)
                      + np.repeat(shift, ls))
                buf[tp] = cols.trace[cols.offsets[lo]:cols.offsets[hi]]
            buf.tofile(f)
            lo = hi


def read_las_columns(path: str) -> tuple[int, LasColumns]:
    """Read a .las into columnar form: native single-pass scan when the
    C runtime is available, else a python record walk."""
    from damar_tpu import native
    head = np.fromfile(path, dtype=np.uint8, count=12)
    if head.size < 12:
        raise ValueError(f"{path}: truncated header")
    novl = int(head[:8].view("<i8")[0])
    tspace = int(head[8:12].view("<i4")[0])
    # validate the record-count claim BEFORE any allocation sized by
    # it: a corrupt header must raise, not trigger a petabyte alloc
    size = os.path.getsize(path)
    if novl < 0 or 12 + 40 * novl > size:
        raise ValueError(
            f"{path}: header claims {novl} records but the file holds "
            f"{size} bytes (corrupt or truncated)")
    small = tspace <= TRACE_XOVR
    scan = native.las_scan(path) if native.available() else None
    if scan is not None:
        headers, trace, offs = scan
        expect = 12 + 40 * len(headers) + int(offs[-1])
        size = os.path.getsize(path)
        if expect != size:
            raise ValueError(f"{path}: {size - expect} trailing bytes")
        return tspace, LasColumns(headers, trace, offs)
    raw = np.fromfile(path, dtype=np.uint8)
    pos = 12
    headers = np.zeros((novl, 10), np.int32)
    offs = np.zeros(novl + 1, np.int64)
    chunks = []
    for i in range(novl):
        rec = raw[pos:pos + 40].view(np.int32)
        headers[i] = rec
        pos += 40
        tb = int(rec[0]) * (1 if small else 2)
        chunks.append(raw[pos:pos + tb])
        offs[i + 1] = offs[i] + tb
        pos += tb
    if pos != len(raw):
        raise ValueError(f"{path}: {len(raw) - pos} trailing bytes")
    trace = (np.concatenate(chunks) if chunks
             else np.zeros(0, np.uint8))
    return tspace, LasColumns(headers, trace, offs)


def read_las(path: str) -> LasFile:
    tspace, cols = read_las_columns(path)
    return LasFile(tspace=tspace, columns=cols)


# --- validation (LAcheck equivalent) ---------------------------------------

def _check_columns(tspace: int, cols: LasColumns, rlen_a, rlen_b,
                   sorted_order: bool, max_report: int = 20) -> list[str]:
    """Vectorized LAcheck over columns (planner gates run it after
    every merge; block merges hold 10^5-10^6 records)."""
    errs: list[str] = []
    h = cols.headers
    n = cols.n
    if n == 0:
        return errs
    small = tspace <= TRACE_XOVR
    rlen_a = np.asarray(rlen_a)
    rlen_b = np.asarray(rlen_b)
    abp, aep = h[:, H_ABPOS], h[:, H_AEPOS]
    bbp, bep = h[:, H_BBPOS], h[:, H_BEPOS]
    la = rlen_a[h[:, H_AREAD]]
    lb = rlen_b[h[:, H_BREAD]]

    def report(mask, what):
        for i in np.nonzero(mask)[0][:max_report]:
            errs.append(f"[{i}] {what(i)}")
        return mask

    bad_a = report((abp < 0) | (abp >= aep) | (aep > la),
                   lambda i: f"bad A interval {abp[i]},{aep[i]} "
                             f"(len {la[i]})")
    bad_b = report((bbp < 0) | (bbp >= bep) | (bep > lb),
                   lambda i: f"bad B interval {bbp[i]},{bep[i]} "
                             f"(len {lb[i]})")
    skip = bad_a | bad_b
    nseg_exp = np.where(aep > abp,
                        (aep - 1) // tspace - abp // tspace + 1, 0)
    nseg_got = h[:, H_TLEN] // 2
    bad_n = report(~skip & (nseg_got != nseg_exp),
                   lambda i: f"trace has {nseg_got[i]} segments, "
                             f"expect {nseg_exp[i]}")
    skip |= bad_n
    # decode all traces at once; per-record reductions via reduceat
    rows = _decode_trace(cols.trace, small)
    seg_off = cols.offsets // (2 if small else 4)
    nz = seg_off[:-1] < seg_off[1:]
    bsum = np.zeros(n, np.int64)
    dsum = np.zeros(n, np.int64)
    if rows.shape[0]:
        bsum[nz] = np.add.reduceat(rows[:, 1], seg_off[:-1][nz])
        dsum[nz] = np.add.reduceat(rows[:, 0], seg_off[:-1][nz])
    report(~skip & (bsum != (bep - bbp).astype(np.int64)),
           lambda i: f"trace b-span {bsum[i]} != {bep[i] - bbp[i]}")
    report(~skip & (dsum != h[:, H_DIFFS]),
           lambda i: f"trace diffs {dsum[i]} != record diffs "
                     f"{h[:, H_DIFFS][i]}")
    # per-segment: diffs >= |aspan - bspan|
    if rows.shape[0]:
        lens = np.diff(seg_off)
        rid = np.repeat(np.arange(n), lens)
        k = np.arange(rows.shape[0]) - np.repeat(seg_off[:-1], lens)
        base = abp[rid].astype(np.int64) // tspace + k
        a0 = np.maximum(abp[rid], base * tspace)
        a1 = np.minimum((base + 1) * tspace, aep[rid])
        segbad = (~skip[rid]) & (rows[:, 0]
                                 < np.abs((a1 - a0) - rows[:, 1]))
        for g in np.nonzero(segbad)[0][:max_report]:
            errs.append(f"[{rid[g]}] seg {k[g]}: diffs {rows[g, 0]} < "
                        f"|aspan-bspan| {abs((a1[g]-a0[g]) - rows[g,1])}")
    if sorted_order and n > 1:
        keys = (h[:, H_AREAD], h[:, H_BREAD], h[:, H_FLAGS] & 1,
                h[:, H_ABPOS])
        after = np.zeros(n - 1, bool)   # strictly greater so far
        viol = np.zeros(n - 1, bool)
        for kcol in keys:
            viol |= ~after & (kcol[1:] < kcol[:-1])
            after |= kcol[1:] > kcol[:-1]
        for i in np.nonzero(viol)[0][:max_report]:
            errs.append(f"[{i + 1}] sort order violation")
    return errs


def check_las(las: LasFile, rlen_a, rlen_b=None, sorted_order: bool = True
              ) -> list[str]:
    """Structural validation of a .las against read lengths (LAcheck).

    rlen_a/rlen_b: arrays mapping absolute read id -> length (b defaults
    to a for intra-DB comparisons).  Returns a list of problem strings
    (empty = clean).  Checks: coordinate bounds, trace segment count and
    b-span consistency, diffs consistency, sort order.  Columnar files
    validate fully vectorized; object-backed files walk records.
    """
    if rlen_b is None:
        rlen_b = rlen_a
    if las.columns is not None:
        return _check_columns(las.tspace, las.columns, rlen_a, rlen_b,
                              sorted_order)
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
    trees; the native streaming merge has no such limit.  The Python
    fallback concatenates columns and re-sorts (stable, same order).
    """
    from damar_tpu import native
    if native.available() and native.las_merge(paths, out):
        return
    las = LasFile.concat([read_las(p) for p in paths])
    las.sort()
    write_las(out, las)


def cat_las(paths: list[str], out: str) -> None:
    write_las(out, LasFile.concat([read_las(p) for p in paths]))


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

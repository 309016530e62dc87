"""Quality-value storage (.qvs) — functional equivalent of the
lineage's QV codec (SURVEY.md §2.1, upstream db/QV.c — upstream-path
citation, reference mount empty).

The reference arithmetic-codes five per-read streams derived from a
PacBio alignment model (deletion QV, deletion char, insertion QV,
merge QV, substitution QV).  This build stores the same five streams
but entropy-codes them with zlib: functionally equivalent storage and
API, NOT byte-compatible with QV.c's coder (the CLR assembly pipeline
never consumes QVs — quality is derived from piles by LAq — so the
codec is an interop nicety, and plain FASTQ qualities land in the
insertion-QV stream).

File layout (.{root}.qvs):
  int32 magic 'DQV1'; int32 nreads;
  per read: int32 rlen; 5 x (int32 comp_len; bytes zlib-stream)
  (empty streams have comp_len 0)
"""
from __future__ import annotations

import os
import zlib

import numpy as np

from damar_tpu.formats.dazzdb import _root

MAGIC = 0x31565144  # 'DQV1' little-endian

STREAMS = ("del_qv", "del_char", "ins_qv", "mrg_qv", "sub_qv")


def qvs_path(db_path: str) -> str:
    d, r = _root(db_path)
    return os.path.join(d, "." + r + ".qvs")


def write_qvs(db_path: str, reads_streams: list[dict]) -> None:
    """reads_streams[i]: dict stream-name -> uint8 array (may be
    missing/empty); plain FASTQ qualities go under 'ins_qv'."""
    with open(qvs_path(db_path), "wb") as f:
        f.write(np.int32(MAGIC).tobytes())
        f.write(np.int32(len(reads_streams)).tobytes())
        for st in reads_streams:
            rlen = max((len(v) for v in st.values()), default=0)
            f.write(np.int32(rlen).tobytes())
            for name in STREAMS:
                v = st.get(name)
                if v is None or len(v) == 0:
                    f.write(np.int32(0).tobytes())
                    continue
                blob = zlib.compress(
                    np.asarray(v, dtype=np.uint8).tobytes(), 6)
                f.write(np.int32(len(blob)).tobytes())
                f.write(blob)


def read_qvs(db_path: str) -> list[dict]:
    raw = open(qvs_path(db_path), "rb").read()
    pos = 0

    def i32():
        nonlocal pos
        v = int(np.frombuffer(raw, "<i4", 1, pos)[0])
        pos += 4
        return v

    if i32() != MAGIC:
        raise ValueError("not a DQV1 .qvs file")
    n = i32()
    out = []
    for _ in range(n):
        rlen = i32()
        st = {}
        for name in STREAMS:
            clen = i32()
            if clen:
                st[name] = np.frombuffer(
                    zlib.decompress(raw[pos:pos + clen]), np.uint8).copy()
                pos += clen
        out.append(st)
    return out


def fastq_to_qvs(db_path: str, quals: list[np.ndarray]) -> None:
    """Store plain FASTQ qualities (phred+33 already stripped) as the
    insertion-QV stream, the slot the lineage reads FASTQ quality
    into."""
    write_qvs(db_path, [{"ins_qv": q} for q in quals])

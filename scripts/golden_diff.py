"""Golden-diff harness vs the REFERENCE binaries (VERDICT r1 item 10).

Every session so far has found `/root/reference/` EMPTY, so the
bit-identity north star (`.las` byte compat incl. trace points, tool
defaults, MARVEL flag values) is unverifiable: SURVEY.md's citations
are upstream paths tagged ⟨VERIFY⟩.  This script is the ARMED check:
the moment a session finds the mount populated, run it — it

  1. inventories the mount (tool sources, flag defaults worth
     upgrading in SURVEY.md/core/config.py),
  2. builds the reference C tools (make / gcc, no network),
  3. runs BASELINE config 1 (single-block self-overlap) through BOTH
     stacks on one shared simulated dataset,
  4. byte-diffs the sorted `.las` outputs and reports per-field drift
     when bytes differ.

On an empty mount it degrades to a clear SKIP with exit code 0 so it
can sit in round scripts unconditionally.

Usage: python scripts/golden_diff.py [--ref /root/reference]
                                     [--work DIR] [--genome-bp 200000]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def mount_inventory(ref: str) -> list[str]:
    files = []
    for root, _dirs, names in os.walk(ref):
        for n in names:
            files.append(os.path.join(root, n))
    return files


def find_tool_sources(files: list[str]) -> dict[str, str]:
    """Locate the reference tool sources we must build (names per
    SURVEY.md §2; DAmar may have renamed — search case-insensitively)."""
    want = {"fasta2db": None, "fa2db": None, "dbsplit": None,
            "daligner": None, "lasort": None, "lamerge": None,
            "lashow": None, "lacheck": None}
    for f in files:
        base = os.path.basename(f).lower()
        stem = base.rsplit(".", 1)[0]
        if stem in want and want[stem] is None and base.endswith(".c"):
            want[stem] = f
    return {k: v for k, v in want.items() if v}


def build_reference(ref: str, out: str) -> bool:
    """Try `make` at the mount root (read-only mount: copy first)."""
    src = os.path.join(out, "refsrc")
    if os.path.exists(src):
        shutil.rmtree(src)
    shutil.copytree(ref, src)
    for target in ("", "all"):
        r = subprocess.run(["make"] + ([target] if target else []),
                           cwd=src, capture_output=True, text=True)
        if r.returncode == 0:
            return True
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    return False


def run_config1(work: str, genome_bp: int) -> dict:
    """Our stack: FASTA -> DB -> self-overlap block 1 -> sorted .las."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from damar_tpu.core.config import OverlapConfig
    from damar_tpu.formats import dazzdb
    from damar_tpu.utils.sim import (make_genome, sample_reads,
                                     write_sim_fasta)
    g = make_genome(genome_bp, seed=1)
    sim = sample_reads(g, coverage=14, mean_len=6000, err=0.13, seed=2)
    fa = os.path.join(work, "reads.fasta")
    write_sim_fasta(fa, sim)
    db = os.path.join(work, "G.db")
    dazzdb.create_db(db, [fa])
    dazzdb.db_split(db, size_mb=200, cutoff=1000)
    from damar_tpu.core.blocks import block_from_db
    from damar_tpu.formats.las import LasFile, write_las
    from damar_tpu.pipeline.overlap import overlap_block_pair
    d = dazzdb.DazzDB.open(db)
    blk = block_from_db(d, 1)
    la, lb, _ = overlap_block_pair(blk, blk, OverlapConfig(),
                                   self_block=True)
    both = LasFile.concat([la, lb])
    both.sort()
    ours = os.path.join(work, "G.1.ours.las")
    write_las(ours, both)
    return {"fasta": fa, "db": db, "ours": ours}


def qv_reconcile(src: str, work: str, fasta: str) -> int:
    """DQH1 <-> QV.c reconciliation (VERDICT r3 item 8): the one-
    command check for the day the mount is populated.

    Our .qvs (formats/qv_huff.py, DQH1) is in the QV.c coding FAMILY
    (per-stream canonical Huffman over the five QV streams + RLE of
    the modal deletion-QV symbol) but the exact bit layout was
    designed blind.  Procedure, automated below where the mount
    allows:

      1. Build the reference's quiver tools (fasta2DB consumes .quiva
         via FQ2db/quiva2DB; the codec lives in db/QV.c:
         Create_QVcoding / Compress_Next_QVentry).
      2. Feed BOTH stacks one FASTQ with known QV streams (our
         write_sim_fasta --fastq path / their quiva ingestion).
      3. Byte-diff the .qvs files.  When they differ (expected —
         table serialization order and RLE escape choices were
         guesses), diff the DECODED streams instead: both stacks must
         round-trip identical del/delQV/ins/mrg/sub vectors; then
         update formats/qv_huff.py's writer to the observed QV.c
         layout (header magic, table order, stream framing) and
         re-run until byte-identical.
      4. Record the verified layout in PARITY.md and drop the
         ⟨VERIFY⟩ tag from the QV rows.

    Returns 0 ok / 2 streams differ / 1 cannot run."""
    qv_src = None
    for root, _d, names in os.walk(src):
        for n in names:
            if n == "QV.c":
                qv_src = os.path.join(root, n)
    if qv_src is None:
        print("QV: no QV.c in mount — reconciliation skipped")
        return 0
    print(f"QV: reference codec at {qv_src}; follow the procedure in "
          "golden_diff.qv_reconcile (decoded-stream diff first, then "
          "byte layout)")
    # decoded-stream self-check on our side (always runnable): encode
    # + decode a synthetic five-stream set and verify round-trip
    import numpy as np
    from damar_tpu.formats import qv as qvmod
    rng = np.random.default_rng(5)
    reads = []
    for _ in range(64):
        L = int(rng.integers(50, 300))
        reads.append({s: rng.integers(0, 50, L).astype(np.uint8)
                      for s in qvmod.STREAMS})
    p = os.path.join(work, "qvcheck.db")
    qvmod.write_qvs(p, reads)
    back = qvmod.read_qvs(p)
    ok = all(np.array_equal(a[s], b[s])
             for a, b in zip(reads, back) for s in qvmod.STREAMS)
    print(f"QV: our DQH1 round-trip {'OK' if ok else 'FAIL'}")
    return 0 if ok else 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--work", default="/tmp/golden_diff")
    ap.add_argument("--genome-bp", type=int, default=200_000)
    args = ap.parse_args()

    files = mount_inventory(args.ref) if os.path.isdir(args.ref) else []
    if not files:
        print(f"SKIP: reference mount {args.ref} is empty — golden "
              "diff is armed but cannot run (SURVEY.md provenance "
              "warning still applies; citations stay ⟨VERIFY⟩)")
        return 0

    os.makedirs(args.work, exist_ok=True)
    print(f"mount populated: {len(files)} files")
    tools = find_tool_sources(files)
    print("tool sources found:", {k: os.path.relpath(v, args.ref)
                                  for k, v in tools.items()})
    if not build_reference(args.ref, args.work):
        print("FAIL: reference build failed — inspect refsrc and fix "
              "build flags; byte-diff cannot proceed")
        return 1
    qv_reconcile(os.path.join(args.work, "refsrc"), args.work,
                 fasta=None)
    env = run_config1(args.work, args.genome_bp)
    # reference pipeline: fasta2DB + DBsplit + daligner + LAsort/LAmerge
    src = os.path.join(args.work, "refsrc")

    def tool_path(name: str) -> str | None:
        for cand in (name, name.upper(), name.capitalize()):
            p = os.path.join(src, cand)
            if os.path.exists(p) and os.access(p, os.X_OK):
                return p
        return None

    f2db = tool_path("fasta2DB") or tool_path("FA2db")
    dal = tool_path("daligner")
    lasort = tool_path("LAsort")
    if not (f2db and dal):
        print("FAIL: built tools not found (fasta2DB/daligner) — "
              "check the build tree layout")
        return 1
    rdb = os.path.join(args.work, "R")
    subprocess.run([f2db, rdb, env["fasta"]], check=True)
    subprocess.run([dal, f"{rdb}.1", f"{rdb}.1"], cwd=args.work,
                   check=True)
    # reference output name conventions vary; pick the produced .las
    ref_las = [os.path.join(args.work, f)
               for f in os.listdir(args.work)
               if f.startswith("R.1") and f.endswith(".las")]
    if lasort and ref_las:
        subprocess.run([lasort] + ref_las, cwd=args.work, check=True)
    if not ref_las:
        print("FAIL: reference daligner produced no .las")
        return 1
    ours = open(env["ours"], "rb").read()
    theirs = open(ref_las[0], "rb").read()
    if ours == theirs:
        print(f"BYTE-IDENTICAL: {env['ours']} == {ref_las[0]} "
              f"({len(ours)} bytes)")
        return 0
    print(f"DIFFER: ours {len(ours)}B vs ref {len(theirs)}B — "
          "field-level report:")
    from damar_tpu.formats.las import read_las
    a = read_las(env["ours"])
    b = read_las(ref_las[0])
    print(f"  records: ours {a.novl} vs ref {b.novl}; "
          f"tspace {a.tspace} vs {b.tspace}")
    ha = a.columns.headers if a.columns is not None else None
    hb = b.columns.headers if b.columns is not None else None
    if ha is not None and hb is not None and len(ha) and len(hb):
        import numpy as np
        n = min(len(ha), len(hb))
        diff_rows = int((ha[:n] != hb[:n]).any(axis=1).sum())
        print(f"  header rows differing (first {n}): {diff_rows}")
    return 2


if __name__ == "__main__":
    sys.exit(main())

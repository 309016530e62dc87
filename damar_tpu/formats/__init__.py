"""Byte-level codecs for the Dazzler/MARVEL on-disk data structures.

These formats are the framework's interop surface with the reference
toolchain (SURVEY.md §2.1 "Core libraries", lineage files db/DB.c,
dalign/align.h, MARVEL lib/tracks.c — upstream-path citations, mount
unavailable): a user of the reference can point damar_tpu at an existing
.db/.las/track tree and vice versa.  Everything here is host-side
numpy — the device-facing layout lives in damar_tpu.core.blocks.
"""

from damar_tpu.formats.fasta import read_fasta, write_fasta
from damar_tpu.formats.dazzdb import DazzDB, create_db, db_split
from damar_tpu.formats.las import LasFile, Overlap, read_las, write_las
from damar_tpu.formats.tracks import Track, read_track, write_track

__all__ = [
    "read_fasta", "write_fasta",
    "DazzDB", "create_db", "db_split",
    "LasFile", "Overlap", "read_las", "write_las",
    "Track", "read_track", "write_track",
]

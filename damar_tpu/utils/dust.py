"""DUST-style low-complexity masking (DBdust equivalent, SURVEY.md
§2.2; upstream db/DBdust.c — upstream-path citation, reference mount
empty).

Scores windows by triplet repetitiveness: score(w) =
sum_t c_t*(c_t-1)/2 / (|w|-2) over triplet counts c_t; windows whose
score exceeds the threshold are masked.  Vectorized per read with a
64-bin sliding histogram (prefix sums over one-hot triplet codes).
"""
from __future__ import annotations

import numpy as np


def triplet_codes(codes: np.ndarray) -> np.ndarray:
    if len(codes) < 3:
        return np.zeros(0, np.int32)
    c = codes.astype(np.int32)
    return (c[:-2] << 4) | (c[1:-1] << 2) | c[2:]


def dust_read(codes: np.ndarray, window: int = 64,
              thresh: float = 2.0) -> np.ndarray:
    """Flat [b,e,...] mask intervals for one read."""
    n = len(codes)
    t = triplet_codes(codes)
    m = len(t)
    if m < window:
        return np.zeros(0, np.int32)
    # prefix counts per triplet value: [65, m+1] (int16 windows suffice)
    onehot = np.zeros((m + 1, 64), np.int32)
    onehot[np.arange(1, m + 1), t] = 1
    pref = np.cumsum(onehot, axis=0)
    w = window - 2  # triplets per window
    cnt = pref[w:] - pref[:-w]                      # [m-w+1, 64]
    score = (cnt * (cnt - 1)).sum(axis=1) / 2.0 / max(w - 1, 1)
    hot = score > thresh                            # window starts
    if not hot.any():
        return np.zeros(0, np.int32)
    # expand window starts to base intervals and merge
    starts = np.nonzero(hot)[0]
    ivs = []
    lo = int(starts[0])
    hi = lo + window
    for s in starts[1:]:
        s = int(s)
        if s <= hi:
            hi = s + window
        else:
            ivs.append((lo, hi))
            lo, hi = s, s + window
    ivs.append((lo, min(hi, n)))
    return np.array(ivs, np.int32).reshape(-1)


def dust_block(seqs: list[np.ndarray], window: int = 64,
               thresh: float = 2.0) -> list[np.ndarray]:
    from damar_tpu import native
    res = native.dust_batch(seqs, window, thresh)
    if res is not None:
        return res
    return [dust_read(s, window, thresh) for s in seqs]

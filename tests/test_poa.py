"""POA window consensus (pipeline.poa) — correctness on the cases the
MSA column caller provably handles, plus graph-specific behaviors.

Note: on simulated 13%-error trough windows the MSA caller MEASURES
BETTER than this POA (synthetic: 0.92 vs 0.85 k16 hit-rate at 5x;
do.py: 99.78 vs 99.74) — see the round-4 falsification notes.  POA
stays available (DAMAR_POA_THIN) as the content-aligned-insertion
variant for datasets where template-frame bias dominates."""
import numpy as np

from damar_tpu.pipeline.poa import poa_consensus


def test_no_covers_returns_template():
    t = np.array([0, 1, 2, 3], np.uint8)
    assert np.array_equal(poa_consensus(t, []), t)


def test_unanimous_covers_override_template_errors():
    rng = np.random.default_rng(0)
    truth = rng.integers(0, 4, 300).astype(np.uint8)
    tmpl = truth.copy()
    tmpl[50] = (tmpl[50] + 1) % 4          # substitution
    tmpl = np.delete(tmpl, 120)            # missing base
    tmpl = np.insert(tmpl, 200, 2)         # extra base
    covers = [truth.copy() for _ in range(4)]
    assert np.array_equal(poa_consensus(tmpl, covers), truth)


def test_insertion_content_aligns_across_covers():
    # covers agree a 3-base block is missing from the template; each
    # carries noise elsewhere, so template-frame insertion columns
    # would misalign — the graph aligns the block's CONTENT
    rng = np.random.default_rng(1)
    truth = rng.integers(0, 4, 240).astype(np.uint8)
    tmpl = np.delete(truth, slice(100, 103))
    covers = []
    for s in range(5):
        c = truth.copy()
        p = 30 + 37 * s
        c[p] = (c[p] + 1) % 4
        covers.append(c)
    assert np.array_equal(poa_consensus(tmpl, covers), truth)


def test_lone_cover_ties_break_to_template():
    t = (np.arange(200) % 4).astype(np.uint8)
    c = t.copy()
    c[77] = (c[77] + 2) % 4
    assert np.array_equal(poa_consensus(t, [c]), t)


def test_partial_covers_vote_only_where_they_reach():
    rng = np.random.default_rng(2)
    truth = rng.integers(0, 4, 300).astype(np.uint8)
    tmpl = truth.copy()
    tmpl[50] = (tmpl[50] + 1) % 4          # error in covered half
    tmpl[250] = (tmpl[250] + 1) % 4        # error NO cover reaches
    covers = [truth[:150].copy() for _ in range(3)]
    out = poa_consensus(tmpl, covers)
    assert np.array_equal(out[:140], truth[:140])
    # the uncovered error must survive (no evidence against it)
    assert not np.array_equal(out, truth)


def test_deterministic():
    rng = np.random.default_rng(3)
    truth = rng.integers(0, 4, 200).astype(np.uint8)
    covers = [np.roll(truth, 0).copy(), truth[10:190].copy()]
    a = poa_consensus(truth, covers)
    b = poa_consensus(truth, covers)
    assert np.array_equal(a, b)

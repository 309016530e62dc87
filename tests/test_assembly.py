"""Full-assembly tests (BASELINE config 5): overlap -> filter -> string
graph -> transitive reduction -> tour -> contigs, validated against the
simulator's ground truth."""
import numpy as np
import pytest

from damar_tpu.core.blocks import block_from_reads
from damar_tpu.core.config import OverlapConfig, ScrubConfig
from damar_tpu.formats.las import LasFile
from damar_tpu.formats.fasta import revcomp
from damar_tpu.pipeline import scrub
from damar_tpu.pipeline.graph import (Edge, StringGraph, Vertex,
                                      build_graph, transitive_reduction,
                                      graphml)
from damar_tpu.pipeline.overlap import overlap_block_pair
from damar_tpu.pipeline.touring import assemble, tour_graph

CFG = OverlapConfig(seed_batch=512)


class TestReductionUnit:
    def _edge(self, a, b, adv, olen=2000):
        return Edge(src=Vertex(a, 0), dst=Vertex(b, 0), cut=0,
                    adv=adv, olen=olen)

    def test_transitive_edge_removed(self):
        g = StringGraph()
        e_ab = self._edge(0, 1, 500)
        e_bc = self._edge(1, 2, 600)
        e_ac = self._edge(0, 2, 1080)   # ~ 500+600 within fuzz
        for e in (e_ab, e_bc, e_ac):
            g.add(e)
        n = transitive_reduction(g, fuzz=100)
        assert n == 1 and e_ac.reduced
        assert not e_ab.reduced and not e_bc.reduced

    def test_non_transitive_kept(self):
        g = StringGraph()
        e_ab = self._edge(0, 1, 500)
        e_bc = self._edge(1, 2, 600)
        e_ac = self._edge(0, 2, 3000)   # far off: keep
        for e in (e_ab, e_bc, e_ac):
            g.add(e)
        assert transitive_reduction(g, fuzz=100) == 0


@pytest.fixture(scope="module")
def assembly(small_sim):
    sim = small_sim
    blk = block_from_reads(sim.reads)
    las_a, las_b, _ = overlap_block_pair(
        blk, blk, CFG, self_block=True,
        hit_cap=1 << 20, seed_cap=1 << 15)
    las = LasFile(CFG.tspace, las_a.overlaps + las_b.overlaps)
    las.sort()
    rlen_of = {i: len(r) for i, r in enumerate(sim.reads)}
    filt = scrub.filter_las(las, rlen_of, ScrubConfig())

    def seq_of(i, d):
        return revcomp(sim.reads[i]) if d else sim.reads[i]

    contigs, tours, g = assemble(filt, rlen_of, seq_of, fuzz=40,
                                 min_dovetail=1000)
    return sim, contigs, tours, g


class TestAssemblyE2E:
    def test_dominant_contig_covers_genome(self, assembly):
        sim, contigs, tours, g = assembly
        assert contigs, "no contigs assembled"
        main = contigs[0]
        G = len(sim.genome)
        # circular genome -> ideally ONE circular contig of ~genome
        # size (insertion-dominated read error inflates it a few %)
        assert len(main) > 0.95 * G, (len(main), G)
        assert len(main) < 1.25 * G, (len(main), G)
        assert tours[0].circular, "main contig should close the circle"
        # and nothing else of significant size
        assert all(len(c) < 0.3 * G for c in contigs[1:]), \
            [len(c) for c in contigs]

    def test_tour_reads_sequential_on_genome(self, assembly):
        """Ground truth: consecutive tour reads must truly overlap and
        advance consistently around the (circular) genome."""
        sim, contigs, tours, g = assembly
        t = tours[0]
        G = len(sim.genome)
        reads = [v.read for v, _ in t.steps]
        assert len(reads) >= 5
        ok = 0
        for (v1, _), (v2, _) in zip(t.steps, t.steps[1:]):
            if sim.true_overlap(v1.read, v2.read, 500):
                ok += 1
        frac = ok / (len(t.steps) - 1)
        assert frac > 0.95, f"only {frac:.2f} of junctions truly overlap"

    def test_graph_not_overconnected(self, assembly):
        sim, contigs, tours, g = assembly
        # after reduction + cleaning, branching should be rare
        branchy = sum(1 for v in g.edges if len(g.out_edges(v)) > 1)
        total = max(1, len([v for v in g.edges if g.out_edges(v)]))
        assert branchy / total < 0.15, f"{branchy}/{total} branch vertices"

    def test_graphml_export(self, assembly, tmp_path):
        sim, contigs, tours, g = assembly
        xml = graphml(g)
        assert xml.startswith('<?xml') and '<graphml' in xml
        assert xml.count('<edge ') == g.n_edges()

    def test_layout_coords(self, assembly):
        from damar_tpu.pipeline.graph import layout_coords, layout_svg
        sim, contigs, tours, g = assembly
        coords = layout_coords(g)
        verts = {e.src for v in g.edges for e in g.out_edges(v)} | \
                {e.dst for v in g.edges for e in g.out_edges(v)}
        assert set(coords) == verts          # every live vertex placed
        # a clean contig path lays out monotonically: most edges
        # advance x by their adv
        ok = sum(1 for v in g.edges for e in g.out_edges(v)
                 if abs((coords[e.dst][0] - coords[e.src][0]) - e.adv)
                 < 1e-6)
        total = max(g.n_edges(), 1)
        assert ok / total > 0.5, f"{ok}/{total} edges respect adv"
        xml = graphml(g, coords=coords)
        assert 'attr.name="x"' in xml and '<data key="x">' in xml
        svg = layout_svg(g, coords)
        assert svg.count("<circle") == len(coords)


class TestBuildGraphColumnar:
    def test_columnar_matches_object_path(self, small_sim):
        """build_graph's columnar fast path must produce the same
        contained set and edge set as the per-record fallback."""
        from damar_tpu.core.blocks import block_from_reads
        from damar_tpu.core.config import OverlapConfig
        from damar_tpu.formats.las import LasFile
        from damar_tpu.pipeline.graph import build_graph
        from damar_tpu.pipeline.overlap import overlap_block_pair
        sim = small_sim
        blk = block_from_reads(sim.reads)
        la, lb, _ = overlap_block_pair(
            blk, blk, OverlapConfig(min_len=900), self_block=True,
            hit_cap=1 << 20, seed_cap=1 << 15)
        both = LasFile.concat([la, lb])
        both.sort()
        rlen = {i: len(r) for i, r in enumerate(sim.reads)}
        g1 = build_graph(both, rlen, fuzz=40, min_dovetail=900)
        obj = LasFile(both.tspace, overlaps=list(both.overlaps))
        g2 = build_graph(obj, rlen, fuzz=40, min_dovetail=900)
        assert g1.contained == g2.contained
        e1 = {(e.src, e.dst): (e.cut, e.adv, e.olen)
              for es in g1.edges.values() for e in es}
        e2 = {(e.src, e.dst): (e.cut, e.adv, e.olen)
              for es in g2.edges.values() for e in es}
        assert e1 == e2 and e1

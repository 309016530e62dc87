"""String/overlap graph construction (OGbuild equivalent, SURVEY.md
§2.7; upstream touring/OGbuild.c, Myers 2005 'The fragment assembly
string graph' — upstream-path citation, reference mount empty).

Vertices are oriented reads (read, dir); a directed edge u -> v means
"contig continues from u into v", labeled with the destination cut
position (oriented-v coordinate where the novel suffix starts) and the
advance length.  One edge is emitted per proper right-dovetail record;
the mirrored .las records supply the twin edges, so the standard
string-graph twin invariant holds without extra bookkeeping.

Containment removal and Myers-style transitive reduction happen here;
touring/bubble/spur logic lives in pipeline.touring.
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from damar_tpu.formats.las import LasFile
from damar_tpu.formats.oflags import OVL_COMP, OVL_DISCARD


@dataclass(frozen=True)
class Vertex:
    read: int
    dir: int  # 0 = forward, 1 = reverse-complement

    @property
    def twin(self) -> "Vertex":
        return Vertex(self.read, 1 - self.dir)


@dataclass
class Edge:
    src: Vertex
    dst: Vertex
    cut: int          # oriented-dst coordinate where novel suffix starts
    adv: int          # bases the edge advances (len(dst) - cut)
    olen: int         # overlap length (support/weight)
    reduced: bool = False


@dataclass
class StringGraph:
    edges: dict[Vertex, list[Edge]] = field(default_factory=lambda:
                                            defaultdict(list))
    in_deg: dict[Vertex, int] = field(default_factory=lambda:
                                      defaultdict(int))
    contained: set[int] = field(default_factory=set)
    reads: set[int] = field(default_factory=set)

    def out_edges(self, v: Vertex) -> list[Edge]:
        return [e for e in self.edges.get(v, []) if not e.reduced]

    def add(self, e: Edge) -> None:
        self.edges[e.src].append(e)
        self.in_deg[e.dst] += 1
        self.reads.add(e.src.read)
        self.reads.add(e.dst.read)

    def live_in_deg(self) -> dict[Vertex, int]:
        d: dict[Vertex, int] = defaultdict(int)
        for es in self.edges.values():
            for e in es:
                if not e.reduced:
                    d[e.dst] += 1
        return d

    def n_edges(self) -> int:
        return sum(len(self.out_edges(v)) for v in list(self.edges))

    def twin_of(self, e: Edge) -> "Edge | None":
        """The reverse-complement counterpart (src'=dst.twin,
        dst'=src.twin) — present when the mirrored .las record produced
        it."""
        for t in self.edges.get(e.dst.twin, []):
            if t.dst == e.src.twin:
                return t
        return None

    def reduce_edge(self, e: Edge) -> None:
        """Mark an edge AND its twin reduced — all graph edits must be
        twin-symmetric or touring sees asymmetric dead ends."""
        e.reduced = True
        t = self.twin_of(e)
        if t is not None:
            t.reduced = True


def build_graph(las: LasFile, rlen_of: dict[int, int], fuzz: int = 25,
                min_dovetail: int = 1000) -> StringGraph:
    """Filtered+mirrored .las -> string graph.

    Only records without DISCARD flags contribute.  Contained reads
    (fully covered by another read) are dropped with all their edges.
    """
    g = StringGraph()
    # pass 1: find contained reads
    for o in las.overlaps:
        if o.flags & OVL_DISCARD:
            continue
        alen = rlen_of[o.aread]
        blen = rlen_of[o.bread]
        if o.abpos <= fuzz and o.aepos >= alen - fuzz:
            g.contained.add(o.aread)
        elif o.bbpos <= fuzz and o.bepos >= blen - fuzz:
            g.contained.add(o.bread)
    # pass 2: dovetail records -> edges.  Right-dovetails (A suffix ~
    # B' prefix) give (a,+)->(b,comp); left-dovetails (A prefix ~ B'
    # suffix) give (b,comp)->(a,+).  Non-comp mirror pairs emit the
    # same edge from both records (dedupe on (src,dst), keep the
    # best-supported); comp pairs emit edge+twin across the mirrors —
    # without the left-dovetail rule, comp left-dovetail adjacencies
    # would be lost entirely (a comp record's mirror is the same
    # handedness).
    best: dict[tuple, Edge] = {}
    for o in las.overlaps:
        if o.flags & OVL_DISCARD:
            continue
        if o.aread in g.contained or o.bread in g.contained:
            continue
        alen = rlen_of[o.aread]
        blen = rlen_of[o.bread]
        olen = o.aepos - o.abpos
        if olen < min_dovetail:
            continue
        comp = 1 if (o.flags & OVL_COMP) else 0
        cand: list[Edge] = []
        if o.aepos >= alen - fuzz and o.bbpos <= fuzz \
                and o.abpos > fuzz and o.bepos < blen - fuzz:
            cand.append(Edge(src=Vertex(o.aread, 0),
                             dst=Vertex(o.bread, comp),
                             cut=o.bepos, adv=blen - o.bepos, olen=olen))
            # twin: continuing from b' reversed into a reversed; the
            # novel part is a's prefix before the overlap.  Non-comp
            # mirror records re-emit the SAME forward edge (left
            # dovetail of the mirror = right dovetail of the record),
            # so the twin must be synthesized here or it never exists.
            cand.append(Edge(src=Vertex(o.bread, 1 - comp),
                             dst=Vertex(o.aread, 1),
                             cut=alen - o.abpos, adv=o.abpos, olen=olen))
        elif o.abpos <= fuzz and o.bepos >= blen - fuzz \
                and o.aepos < alen - fuzz and o.bbpos > fuzz:
            cand.append(Edge(src=Vertex(o.bread, comp),
                             dst=Vertex(o.aread, 0),
                             cut=o.aepos, adv=alen - o.aepos, olen=olen))
            cand.append(Edge(src=Vertex(o.aread, 1),
                             dst=Vertex(o.bread, 1 - comp),
                             cut=blen - o.bbpos, adv=o.bbpos, olen=olen))
        for e in cand:
            key = (e.src, e.dst)
            old = best.get(key)
            if old is None or e.olen > old.olen:
                best[key] = e
    for e in best.values():
        g.add(e)
    return g


def transitive_reduction(g: StringGraph, fuzz: int = 100) -> int:
    """Myers 2005 mark-and-sweep: an edge v->w is transitive when some
    v->x and x->w exist with adv(v->x)+adv(x->w) ~ adv(v->w).  Returns
    the number of edges reduced."""
    n_red = 0
    for v in list(g.edges):
        outs = list(g.edges.get(v, []))
        if len(outs) < 2:
            continue
        outs.sort(key=lambda e: e.adv)
        target_adv = {(e.dst.read, e.dst.dir): e for e in outs}
        longest = outs[-1].adv
        for e_vx in outs:
            # NOTE: already-reduced edges still witness transitivity
            # (the path they certify exists regardless), so they are
            # not skipped here — skipping them leaves order-dependent
            # un-reduced transitive edges behind.
            for e_xw in g.edges.get(e_vx.dst, []):
                tot = e_vx.adv + e_xw.adv
                if tot > longest + fuzz:
                    continue
                key = (e_xw.dst.read, e_xw.dst.dir)
                e_vw = target_adv.get(key)
                if e_vw is not None and not e_vw.reduced \
                        and e_vw is not e_vx \
                        and abs(e_vw.adv - tot) <= fuzz:
                    g.reduce_edge(e_vw)
                    n_red += 1
    return n_red


def graphml(g: StringGraph) -> str:
    """Export the live graph as GraphML (the OGbuild output format)."""
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="cut" for="edge" attr.name="cut" attr.type="int"/>',
        '  <key id="adv" for="edge" attr.name="adv" attr.type="int"/>',
        '  <key id="olen" for="edge" attr.name="olen" attr.type="int"/>',
        '  <graph id="G" edgedefault="directed">',
    ]
    seen = set()
    def vid(v):
        return f"{v.read}{'-' if v.dir else '+'}"
    for v in list(g.edges):
        for e in g.out_edges(v):
            for u in (e.src, e.dst):
                if vid(u) not in seen:
                    seen.add(vid(u))
                    lines.append(f'    <node id="{vid(u)}"/>')
            lines.append(
                f'    <edge source="{vid(e.src)}" target="{vid(e.dst)}">'
                f'<data key="cut">{e.cut}</data>'
                f'<data key="adv">{e.adv}</data>'
                f'<data key="olen">{e.olen}</data></edge>')
    lines += ['  </graph>', '</graphml>']
    return "\n".join(lines)

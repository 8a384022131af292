"""True progressive anchoring up the guide tree (consensus-ladder design).

The reference ProgressiveAligner aligns ancestral profiles node by node with
a recursive anchor search per node (src/progressiveMauve.cpp:575-710); the
extant-only full-multiplicity anchoring this replaces collapses at high
divergence (a weight-w seed must survive in EVERY genome simultaneously).

TPU-first redesign: post-order over the guide tree, each node holds
  * a consensus REPRESENTATIVE sequence for its clade (majority base per
    alignment column — the profile stand-in that keeps K1/K2 on plain
    2-bit code arrays and the MXU-friendly pairwise DP unchanged), and
  * per-member signed COLUMN MAPS rep-position -> genome position
    (0 = gap; negative = reverse strand, composing through inversions).

At an internal node the two children's representatives are aligned with the
full single-pair pipeline (device anchoring, LCBs with breakpoint
elimination — rearrangements handled at every level — recursion, gapped
closure), unaligned regions are carried along as single-child columns (so
clade-specific content can still anchor at higher nodes: the
translated-anchor semantic), and member maps compose through the node's
column structure.  The root's columns expand to the final n-way
IntervalList, split wherever any genome's positions break contiguity
(descendant-level rearrangements).

A clade consensus is closer to the ancestral sequence than any extant
member, so per-node pairwise seeds survive divergence that defeats
full-multiplicity extant seeds — the same sensitivity amplifier the
reference gets from profile anchoring.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mauvealigner_tpu.analysis.score_alignment import _interval_positions
from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import CODE_N, Genome
from mauvealigner_tpu.models.lcb import LCB


class NodeProfile:
    """A clade's consensus representative + signed member column maps."""

    __slots__ = ("members", "rep", "colmaps")

    def __init__(self, members, rep, colmaps):
        self.members: List[int] = members
        self.rep: Genome = rep
        self.colmaps: Dict[int, np.ndarray] = colmaps  # int64 [len(rep)]


def leaf_profile(index: int, genome: Genome) -> NodeProfile:
    colmap = np.arange(1, len(genome) + 1, dtype=np.int64)
    return NodeProfile([index], genome, {index: colmap})


def _member_bases(
    genomes: Sequence[Genome], colmap: np.ndarray, member: int
) -> np.ndarray:
    """Base codes of one member along rep columns (4 = gap/N)."""
    out = np.full(len(colmap), CODE_N, np.uint8)
    nz = colmap != 0
    idx = np.abs(colmap[nz]) - 1
    b = genomes[member].codes[idx].astype(np.uint8)
    rev = colmap[nz] < 0
    acgt = b < CODE_N
    flip = rev & acgt
    b = np.where(flip, 3 - b, b)
    out[nz] = b
    return out


def consensus_codes(genomes: Sequence[Genome], prof: NodeProfile) -> np.ndarray:
    """Majority base per rep column over the clade members (ties resolved
    toward the lowest code — deterministic); columns where no member has an
    unambiguous base become N."""
    L = len(prof.colmaps[prof.members[0]])
    votes = np.zeros((4, L), np.int32)
    for m in prof.members:
        b = _member_bases(genomes, prof.colmaps[m], m)
        ok = b < 4
        for c in range(4):
            votes[c] += (b == c) & ok
    best = votes.argmax(axis=0).astype(np.uint8)
    none = votes.sum(axis=0) == 0
    best[none] = CODE_N
    return best


def _node_alignment_columns(ivl: IntervalList) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate every interval's per-row signed positions: two int64
    arrays [n_cols_total] for (row 0, row 1)."""
    pa, pb = [], []
    for iv in ivl.intervals:
        pa.append(_interval_positions(iv, 0))
        pb.append(_interval_positions(iv, 1))
    if not pa:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(pa), np.concatenate(pb)


def _compose(colmap: np.ndarray, node_pos: np.ndarray) -> np.ndarray:
    """Compose a child colmap through the node's signed child-rep positions:
    out[c] = sign(node_pos[c]) * colmap[|node_pos[c]|-1] (0 stays 0)."""
    out = np.zeros(len(node_pos), np.int64)
    nz = node_pos != 0
    idx = np.abs(node_pos[nz]) - 1
    vals = colmap[idx]
    neg = node_pos[nz] < 0
    out[nz] = np.where(neg, -vals, vals)
    return out


def merge_profiles(
    genomes: Sequence[Genome],
    a: NodeProfile,
    b: NodeProfile,
    aligner_factory,
    node_name: str,
) -> NodeProfile:
    """Align the two children's representatives with the full pairwise
    pipeline and compose the column maps.  Unaligned regions ride along as
    single-child columns (IntervalList.add_unaligned_intervals), so nothing
    is lost to higher nodes."""
    import time

    from mauvealigner_tpu.utils import timing

    t0 = time.perf_counter()
    aligner = aligner_factory()
    res = aligner.align([a.rep, b.rep])
    timing.GLOBAL.add("tp_pair_align_s", time.perf_counter() - t0)
    t0 = time.perf_counter()
    ivl = res.interval_list
    ivl.add_unaligned_intervals()
    pos_a, pos_b = _node_alignment_columns(ivl)
    colmaps: Dict[int, np.ndarray] = {}
    for m in a.members:
        colmaps[m] = _compose(a.colmaps[m], pos_a)
    for m in b.members:
        colmaps[m] = _compose(b.colmaps[m], pos_b)
    prof = NodeProfile(a.members + b.members, None, colmaps)
    timing.GLOBAL.add("tp_compose_s", time.perf_counter() - t0)
    t0 = time.perf_counter()
    rep_codes = consensus_codes(genomes, prof)
    prof.rep = Genome.from_codes(rep_codes.astype(np.int64), name=node_name)
    timing.GLOBAL.add("tp_consensus_s", time.perf_counter() - t0)
    return prof


def emit_intervals(
    genomes: Sequence[Genome], root: NodeProfile
) -> IntervalList:
    """Expand the root profile to the final n-way IntervalList, splitting at
    every column where any genome's positions break contiguity (signed
    positions advance by exactly +1 between consecutive present columns on
    both strands under the signed-leftmost convention)."""
    n = len(genomes)
    L = len(root.colmaps[root.members[0]])
    pos = np.zeros((n, L), np.int64)
    for m in root.members:
        pos[m] = root.colmaps[m]
    present = pos != 0
    any_present = present.any(axis=0)
    # break BEFORE column c when, for some genome, the previous present
    # column's position does not precede c's by exactly 1 (or presence
    # toggles in a way that ends a run: a gap only breaks when the next
    # present position is discontiguous)
    breaks = np.zeros(L, bool)
    for g in range(n):
        p = pos[g]
        idx = np.nonzero(p != 0)[0]
        if len(idx) < 2:
            continue
        bad = p[idx[1:]] != p[idx[:-1]] + 1
        breaks[idx[1:][bad]] = True
    # all-gap columns are simply dropped within each segment (via `keep`
    # below); they never violate the contiguity invariant, so no extra
    # breaks are needed around them
    seg_bounds = np.nonzero(breaks)[0]
    edges = np.concatenate([[0], seg_bounds, [L]])
    intervals: List[Interval] = []
    for s0, s1 in zip(edges[:-1], edges[1:]):
        if s1 <= s0:
            continue
        cols = slice(s0, s1)
        sub = pos[:, cols]
        keep = any_present[cols]
        if not keep.any():
            continue
        sub = sub[:, keep]
        aln = sub != 0
        starts = np.zeros(n, np.int64)
        for g in range(n):
            nzg = np.nonzero(sub[g])[0]
            if not len(nzg):
                continue
            first, last = sub[g, nzg[0]], sub[g, nzg[-1]]
            starts[g] = first if first > 0 else last
        intervals.append(Interval(starts, aln))
    return IntervalList(genomes=list(genomes), intervals=intervals)


def lcbs_from_intervals(ivl: IntervalList) -> List[LCB]:
    """Block descriptors for reporting (weight = column count)."""
    out = []
    for iv in ivl.intervals:
        if iv.multiplicity() < 2:
            continue
        lens = iv.aln.sum(axis=1).astype(np.int64)
        lefts = np.abs(iv.starts)
        rights = np.where(lefts > 0, lefts + lens - 1, 0)
        out.append(
            LCB(
                match_indices=np.zeros(0, np.int64),
                weight=float(iv.n_cols),
                lefts=np.where(iv.starts != 0, lefts, 0),
                rights=rights,
                strands=np.sign(iv.starts).astype(np.int8),
            )
        )
    return out


def tree_progressive_align(
    genomes: Sequence[Genome],
    tree,
    aligner_factory,
) -> Tuple[IntervalList, List[LCB]]:
    """Post-order consensus-ladder alignment; returns (intervals, blocks).

    aligner_factory() -> a configured MauveAligner for one pairwise node
    merge (a fresh instance per node: the aligner caches per-run state)."""
    counter = [0]

    def build(node) -> NodeProfile:
        if node.is_leaf:
            i = int(node.name)
            if not 0 <= i < len(genomes):
                raise ValueError(
                    f"guide-tree leaf {node.name!r} is not a 0-based genome "
                    f"index (n_genomes={len(genomes)})"
                )
            return leaf_profile(i, genomes[i])
        prof = build(node.children[0])
        for child in node.children[1:]:
            right = build(child)
            counter[0] += 1
            prof = merge_profiles(
                genomes, prof, right, aligner_factory, f"node{counter[0]}"
            )
        return prof

    import time

    from mauvealigner_tpu.utils import timing

    root = build(tree)
    t0 = time.perf_counter()
    ivl = emit_intervals(genomes, root)
    out = ivl, lcbs_from_intervals(ivl)
    timing.GLOBAL.add("tp_emit_s", time.perf_counter() - t0)
    return out

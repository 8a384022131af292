"""Homology-HMM backbone detection and application (L6b).

Equivalent of libMems Backbone.h + HomologyHMM (reference driver:
applyBackbone, src/progressiveMauve.cpp:226-260): a 2-state pair-HMM
(Homologous / Unrelated) is posterior-decoded over the columns of every
pairwise projection of the alignment; sequence regions predicted Unrelated
to every partner are un-aligned; remaining dense regions form the backbone.

Parameter parity: transition priors iGoHomologous (pgh, default 1e-5) and
iGoUnrelated (pgu, default 1e-9) and the identity-adaptation knob (default
0.7) follow src/progressiveMauve.cpp:319-322; emissions are GC-adapted
(getAdaptedHoxdMatrixParameters / computeGC / adaptToPercentIdentity,
src/progressiveMauve.cpp:231-237).  The scan itself is the batched K4
forward-backward kernel (ops/hmm.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, TextIO, Tuple, Union

import jax.numpy as jnp
import numpy as np

from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.ops import hmm as hmm_ops

# column symbol classes; SYM_NONE marks both-gap columns of a pairwise
# projection — the reference scores the PROJECTED pair (both-gap columns
# removed), so they must be emission-neutral, not gap-emitting
SYM_MATCH, SYM_TRANSITION, SYM_TRANSVERSION, SYM_GAP, SYM_NONE = 0, 1, 2, 3, 4
N_SYMBOLS = 5        # symbol alphabet incl. SYM_NONE
N_EMIT_SYMBOLS = 4   # emission classes (SYM_NONE is emission-neutral)
STATE_H, STATE_U = 0, 1


@dataclasses.dataclass
class HmmParams:
    """Homology HMM parameters (Params equivalent)."""

    go_homologous: float = 1e-5   # U -> H transition (pgh)
    go_unrelated: float = 1e-9    # H -> U transition (pgu)
    emit_h: np.ndarray = None     # [4] symbol probs in Homologous state
    emit_u: np.ndarray = None     # [4] symbol probs in Unrelated state

    def log_trans(self) -> np.ndarray:
        t = np.array(
            [
                [1.0 - self.go_unrelated, self.go_unrelated],
                [self.go_homologous, 1.0 - self.go_homologous],
            ]
        )
        return np.log(t)

    def log_emit_table(self) -> np.ndarray:
        return np.log(np.stack([self.emit_h, self.emit_u]) + 1e-300)


def compute_gc(genomes: Sequence[Genome]) -> float:
    """GC fraction over all genomes (computeGC equivalent)."""
    gc = total = 0
    for g in genomes:
        codes = g.codes
        acgt = codes < 4
        total += int(acgt.sum())
        gc += int(((codes == 1) | (codes == 2)).sum())
    return gc / total if total else 0.5


def adapted_params(
    gc_content: float,
    identity: float = 0.7,
    go_homologous: float = 1e-5,
    go_unrelated: float = 1e-9,
    denovo: bool = False,
) -> HmmParams:
    """GC- and identity-adapted emission distributions
    (getAdaptedHoxdMatrixParameters + adaptToPercentIdentity equivalents).

    Homologous state: matches with probability `identity`; mismatches split
    2:1 transition:transversion; a modest gap mass.  Unrelated state:
    coincidental matches at the GC-dependent background rate
    p_match = 2*((gc/2)^2 + ((1-gc)/2)^2), heavy gap mass (unrelated regions
    align mostly against gaps).
    """
    gap_h = 0.05
    mism_h = max(1.0 - identity - gap_h, 1e-6)
    emit_h = np.array([identity, mism_h * 2 / 3, mism_h / 3, gap_h])
    if denovo:
        # de-novo flank extension re-ALIGNS the candidate regions, and a
        # global aligner manufactures coincidental matches from unrelated
        # sequence (measured: ~55% match, ~25-45% gap columns for random
        # inputs).  The unrelated state must absorb that alignment bias; the
        # gap fraction then carries the discrimination.
        gap_u = 0.30
        match_u = 0.55
        mism_u = 1.0 - gap_u - match_u
    else:
        p_bg = 2 * ((gc_content / 2) ** 2 + ((1 - gc_content) / 2) ** 2)
        gap_u = 0.4
        match_u = p_bg * (1 - gap_u)
        mism_u = (1 - gap_u) * (1 - p_bg)
    emit_u = np.array([match_u, mism_u * 0.5, mism_u * 0.5, gap_u])
    emit_h /= emit_h.sum()
    emit_u /= emit_u.sum()
    return HmmParams(go_homologous, go_unrelated, emit_h, emit_u)


_TRANSITION_PAIRS = {(0, 2), (2, 0), (1, 3), (3, 1)}  # A<->G, C<->T


def column_symbols(
    iv: Interval, genomes: Sequence[Genome], i: int, j: int
) -> np.ndarray:
    """Symbol class per column for the (i, j) pairwise projection.

    Columns where both are gapped get SYM_NONE (emission-neutral: the
    pairwise projection the reference decodes does not contain them, and a
    long third-sequence insertion must not drive the pair into Unrelated).
    """
    ci = _signed_codes_row(iv, genomes, i)
    cj = _signed_codes_row(iv, genomes, j)
    sym = np.full(iv.n_cols, SYM_GAP, np.int8)
    sym[(ci == 5) & (cj == 5)] = SYM_NONE
    both = (ci < 4) & (cj < 4)
    eq = both & (ci == cj)
    sym[eq] = SYM_MATCH
    mism = both & ~eq
    if mism.any():
        pairs = ci[mism] * 4 + cj[mism]
        is_transition = np.isin(pairs, [0 * 4 + 2, 2 * 4 + 0, 1 * 4 + 3, 3 * 4 + 1])
        vals = np.where(is_transition, SYM_TRANSITION, SYM_TRANSVERSION)
        sym[mism] = vals
    return sym


def _signed_codes_row(iv: Interval, genomes: Sequence[Genome], seq: int) -> np.ndarray:
    """Per-column base code (4=N, 5=gap/absent) in match-space orientation."""
    out = np.full(iv.n_cols, 5, np.int8)
    s = int(iv.starts[seq])
    if s == 0:
        return out
    length = int(iv.aln[seq].sum())
    codes = genomes[seq].sub_codes_signed(s, length).astype(np.int8)
    out[iv.aln[seq]] = codes
    return out


def pairwise_homology_posteriors(
    ivs: IntervalList,
    params: HmmParams,
    max_cols: int = 1 << 16,
    threshold: Optional[float] = None,
) -> Dict[Tuple[int, int, int], np.ndarray]:
    """P(Homologous) per column for every (interval, i, j) pairwise
    projection with both sequences present.  Batched through the K4 kernel
    with length bucketing.

    With `threshold` set, the comparison runs on device and bool arrays
    come back (a quarter of the f32 transfer) — the backbone detector only
    consumes the thresholded posterior."""
    genomes = ivs.genomes
    overlap = 512
    # SYM_NONE (both-gap) columns are REMOVED before the decode — the
    # reference decodes the pairwise projection, which does not contain
    # them, so transition probability must not accrue across a long
    # third-sequence insertion.  Posteriors are scattered back to full
    # column space with forward-fill across the removed columns (the
    # projected decode's state carries over them; detect_backbone masks
    # those columns with iv.aln anyway).
    jobs = []  # (key, chunk_start_in_compact, symbols_chunk)
    compact_idx: Dict[Tuple[int, int, int], np.ndarray] = {}
    full_len: Dict[Tuple[int, int, int], int] = {}
    for k, iv in enumerate(ivs.intervals):
        present = [s for s in range(iv.n_seqs) if iv.starts[s] != 0]
        for ai in range(len(present)):
            for bi in range(ai + 1, len(present)):
                i, j = present[ai], present[bi]
                sym_full = column_symbols(iv, genomes, i, j)
                key = (k, i, j)
                nz = np.nonzero(sym_full != SYM_NONE)[0]
                full_len[key] = len(sym_full)
                compact_idx[key] = nz
                sym_c = sym_full[nz]
                T_c = len(sym_c)
                if T_c == 0:
                    continue
                if T_c <= max_cols:
                    jobs.append((key, 0, sym_c))
                else:
                    # chunk with overlap; posteriors stitched mid-overlap
                    step = max_cols - overlap
                    for a in range(0, T_c, step):
                        b = min(a + max_cols, T_c)
                        jobs.append((key, a, sym_c[a:b]))
                        if b == T_c:
                            break
    out: Dict[Tuple[int, int, int], np.ndarray] = {}
    if not jobs:
        return out
    log_emit_table = params.log_emit_table()  # [2, 4]
    emits = [
        log_emit_table[:, sym].T.astype(np.float32) for (_, _, sym) in jobs
    ]
    decoded = hmm_ops.bucketed_decode(
        emits,
        params.log_trans(),
        np.log([0.5, 0.5]),
        mode="posterior0" if threshold is None else "threshold0",
        threshold=0.5 if threshold is None else threshold,
        max_cols=max_cols,
    )
    compact_out: Dict[Tuple[int, int, int], np.ndarray] = {}
    for (key, a, sym), p in zip(jobs, decoded):
        if key not in compact_out:
            compact_out[key] = np.zeros(
                len(compact_idx[key]), bool if threshold is not None else np.float64
            )
        if a == 0:
            compact_out[key][a : a + len(sym)] = p
        else:
            # skip the first half-overlap (burn-in) when stitching
            skip = overlap // 2
            compact_out[key][a + skip : a + len(sym)] = p[skip:]
    for key, pc in compact_out.items():
        nz = compact_idx[key]
        T_full = full_len[key]
        if len(nz) == T_full:
            out[key] = pc
        else:
            # forward-fill from the nearest decoded column at/before each
            # position (clamped to the first decoded column at the start)
            carry = np.maximum(
                np.searchsorted(nz, np.arange(T_full), side="right") - 1, 0
            )
            out[key] = pc[carry]
    return out


@dataclasses.dataclass
class BackboneColumnSegment:
    interval_index: int
    col_start: int
    col_end: int                 # half-open
    seqs: List[int]              # sequences homologous over this range


def detect_backbone(
    ivs: IntervalList,
    params: HmmParams,
    island_gap_size: int = 20,
    posterior_threshold: float = 0.5,
) -> List[BackboneColumnSegment]:
    """detectBackbone + BigGapsDetector equivalents
    (src/progressiveMauve.cpp:242-243): per sequence per column, homologous
    iff some partner's pair-HMM posterior exceeds the threshold; gap runs
    longer than island_gap_size are never backbone."""
    posts = pairwise_homology_posteriors(ivs, params, threshold=posterior_threshold)
    segments: List[BackboneColumnSegment] = []
    for k, iv in enumerate(ivs.intervals):
        present = [s for s in range(iv.n_seqs) if iv.starts[s] != 0]
        if not present:
            continue
        hom = np.zeros((iv.n_seqs, iv.n_cols), bool)
        for (kk, i, j), good in posts.items():
            if kk != k:
                continue
            hom[i] |= good & iv.aln[i]
            hom[j] |= good & iv.aln[j]
        # BigGapsDetector: long gap runs are not backbone for that sequence
        for s in present:
            gaps = ~iv.aln[s]
            d = np.diff(np.concatenate([[0], gaps.view(np.int8), [0]]))
            starts = np.nonzero(d == 1)[0]
            ends = np.nonzero(d == -1)[0]
            for a, b in zip(starts, ends):
                if b - a > island_gap_size:
                    hom[s, a:b] = False
        if len(present) == 1:
            continue
        # segment columns by the constant homologous-set signature
        sig = hom[present].T  # [n_cols, n_present]
        if not len(sig):
            continue
        change = np.ones(iv.n_cols, bool)
        change[1:] = np.any(sig[1:] != sig[:-1], axis=1)
        seg_starts = np.nonzero(change)[0]
        seg_ends = np.append(seg_starts[1:], iv.n_cols)
        for a, b in zip(seg_starts, seg_ends):
            seqs = [present[x] for x in range(len(present)) if sig[a, x]]
            if len(seqs) >= 2:
                segments.append(BackboneColumnSegment(k, int(a), int(b), seqs))
    return segments


def detect_backbone_big_gaps(
    ivs: IntervalList,
    gap_size: int,
    gene_bounds: Optional[Sequence[np.ndarray]] = None,
) -> List[BackboneColumnSegment]:
    """Gap-structure-only backbone (the bbBreakOnGenes pipeline,
    src/bbBreakOnGenes.cpp:41-225): for every sequence pair, HSS = maximal
    runs of pairwise-projected columns with no gap run > gap_size in either
    member (BigGapsDetector semantics); pairwise predictions merge into
    n-way segments by the constant homologous-set signature.

    gene_bounds[s] (sorted positions p, "cut between genome positions p-1
    and p of sequence s") additionally split segments at the matching
    alignment columns — the applyBreakpoints(gene_bounds) step
    (src/bbBreakOnGenes.cpp:92-103,222).  Deviation: the reference splits
    each *pairwise* HSS before the n-way merge; splitting the merged
    segments at all members' bound columns yields the same cut positions
    because merging never moves a pairwise cut."""
    from mauvealigner_tpu.analysis.score_alignment import _interval_positions

    segments: List[BackboneColumnSegment] = []
    for k, iv in enumerate(ivs.intervals):
        present = [s for s in range(iv.n_seqs) if iv.starts[s] != 0]
        if len(present) < 2:
            continue
        hom = np.zeros((iv.n_seqs, iv.n_cols), bool)
        for a in range(len(present)):
            for b in range(a + 1, len(present)):
                i, j = present[a], present[b]
                proj_cols = np.nonzero(iv.aln[i] | iv.aln[j])[0]
                if not len(proj_cols):
                    continue
                big = np.zeros(len(proj_cols), bool)
                for s in (i, j):
                    gaps = ~iv.aln[s, proj_cols]
                    d = np.diff(np.concatenate([[0], gaps.view(np.int8), [0]]))
                    for ga, gb in zip(np.nonzero(d == 1)[0], np.nonzero(d == -1)[0]):
                        if gb - ga > gap_size:
                            big[ga:gb] = True
                keep = proj_cols[~big]
                hom[i, keep] = True
                hom[j, keep] = True
        # per-interval cut columns from gene boundaries of every member
        cuts: set = set()
        if gene_bounds is not None:
            for s in present:
                bounds = gene_bounds[s]
                if bounds is None or not len(bounds):
                    continue
                pos = np.abs(_interval_positions(iv, s))
                pcols = np.nonzero(pos)[0]
                if not len(pcols):
                    continue
                pvals = pos[pcols]
                if iv.starts[s] > 0:
                    # ascending positions: cut before first col with pos >= p
                    idx = np.searchsorted(pvals, bounds, side="left")
                    ok = (idx > 0) & (idx < len(pcols))
                    cuts.update(int(c) for c in pcols[idx[ok]])
                else:
                    # descending: cols with pos < p are the last (count) ones
                    rv = pvals[::-1]
                    cnt = np.searchsorted(rv, bounds, side="left")
                    ok = (cnt > 0) & (cnt < len(pcols))
                    cuts.update(int(c) for c in pcols[len(pcols) - cnt[ok]])
        cut_list = sorted(cuts)
        # segment columns by the constant homologous-set signature
        sig = hom[present].T
        change = np.ones(iv.n_cols, bool)
        change[1:] = np.any(sig[1:] != sig[:-1], axis=1)
        for c in cut_list:
            change[c] = True
        seg_starts = np.nonzero(change)[0]
        seg_ends = np.append(seg_starts[1:], iv.n_cols)
        for a, b in zip(seg_starts, seg_ends):
            seqs = [present[x] for x in range(len(present)) if sig[a, x]]
            if len(seqs) >= 2:
                segments.append(BackboneColumnSegment(k, int(a), int(b), seqs))
    return segments


def merge_adjacent_segments(segments: List[BackboneColumnSegment]) -> List[BackboneColumnSegment]:
    """Merge column-adjacent segments with the same sequence set
    (mergeAdjacentSegments equivalent)."""
    out: List[BackboneColumnSegment] = []
    for seg in sorted(segments, key=lambda s: (s.interval_index, s.col_start)):
        if (
            out
            and out[-1].interval_index == seg.interval_index
            and out[-1].col_end == seg.col_start
            and out[-1].seqs == seg.seqs
        ):
            out[-1] = BackboneColumnSegment(
                seg.interval_index, out[-1].col_start, seg.col_end, seg.seqs
            )
        else:
            out.append(seg)
    return out


def merge_coordinate_rows(rows: List[np.ndarray]) -> List[np.ndarray]:
    """Merge coordinate rows that are exactly adjacent in every member
    sequence with the same membership (mergeAdjacentSegments over
    bb_seqentry_t rows)."""
    if not rows:
        return rows
    rows = sorted(rows, key=lambda r: (tuple(r[::2] == 0), abs(int(r[0])), abs(int(r[2] if len(r) > 2 else 0))))
    out: List[np.ndarray] = [rows[0].copy()]
    for r in rows[1:]:
        prev = out[-1]
        members_prev = prev[::2] != 0
        members_r = r[::2] != 0
        if np.array_equal(members_prev, members_r) and all(
            abs(int(r[2 * s])) == abs(int(prev[2 * s + 1])) + 1
            and np.sign(r[2 * s]) == np.sign(prev[2 * s])
            for s in np.nonzero(members_r)[0]
        ):
            for s in np.nonzero(members_r)[0]:
                prev[2 * s + 1] = r[2 * s + 1]
        else:
            out.append(r.copy())
    return out


def backbone_seq_coordinates(
    ivs: IntervalList, segments: List[BackboneColumnSegment]
) -> List[np.ndarray]:
    """Per segment: signed per-seq [left, right] coordinate pairs
    (writeBackboneSeqCoordinates equivalent)."""
    from mauvealigner_tpu.analysis.score_alignment import _interval_positions

    rows = []
    pos_cache: Dict[Tuple[int, int], np.ndarray] = {}
    for seg in segments:
        iv = ivs.intervals[seg.interval_index]
        coords = np.zeros(2 * ivs.n_seqs, np.int64)
        for s in seg.seqs:
            key = (seg.interval_index, s)
            if key not in pos_cache:
                pos_cache[key] = _interval_positions(iv, s)
            p = pos_cache[key][seg.col_start : seg.col_end]
            p = p[p != 0]
            if len(p) == 0:
                continue
            sign = int(np.sign(p[0]))
            lo, hi = int(np.abs(p).min()), int(np.abs(p).max())
            coords[2 * s] = sign * lo
            coords[2 * s + 1] = sign * hi
        rows.append(coords)
    return rows


def add_unique_segments(
    rows: List[np.ndarray], ivs: IntervalList, seq_lengths: Sequence[int]
) -> List[np.ndarray]:
    """Append per-genome segments covered by no backbone row
    (addUniqueSegments equivalent): regions unique to one genome."""
    n = ivs.n_seqs
    out = list(rows)
    for s in range(n):
        glen = seq_lengths[s]
        if glen == 0:
            continue
        covered = np.zeros(glen + 2, bool)
        for r in rows:
            l, rr = abs(int(r[2 * s])), abs(int(r[2 * s + 1]))
            if l > 0:
                covered[l : rr + 1] = True
        free = ~covered[1 : glen + 1]
        d = np.diff(np.concatenate([[0], free.view(np.int8), [0]]))
        starts = np.nonzero(d == 1)[0] + 1
        ends = np.nonzero(d == -1)[0]
        for a, b in zip(starts, ends):
            row = np.zeros(2 * n, np.int64)
            row[2 * s] = a
            row[2 * s + 1] = b
            out.append(row)
    return out


def write_backbone_seq_file(rows: List[np.ndarray], out: Union[str, TextIO], n_seqs: int) -> None:
    """.backbone TSV (writeBackboneSeqFile format: header + signed coords)."""
    if isinstance(out, str):
        with open(out, "w") as fh:
            write_backbone_seq_file(rows, fh, n_seqs)
            return
    fh = out
    fh.write("\t".join(f"seq{i}_leftend\tseq{i}_rightend" for i in range(n_seqs)) + "\n")
    for r in rows:
        fh.write("\t".join(str(int(v)) for v in r) + "\n")


def read_backbone_seq_file(src: Union[str, TextIO]) -> List[np.ndarray]:
    if isinstance(src, str):
        with open(src) as fh:
            return read_backbone_seq_file(fh)
    rows = []
    for line in src:
        line = line.strip()
        if not line or line.startswith("seq0"):
            continue
        rows.append(np.array([int(x) for x in line.split("\t")], np.int64))
    return rows


def write_backbone_cols_file(
    segments: List[BackboneColumnSegment], out: Union[str, TextIO]
) -> None:
    """.bbcols: per line `interval col_start col_end seq seq ...` — all
    whitespace-separated tokens, the format the reference's bbcols reader
    consumes (src/stripSubsetLCBs.cpp:78-104)."""
    if isinstance(out, str):
        with open(out, "w") as fh:
            write_backbone_cols_file(segments, fh)
            return
    for seg in segments:
        out.write(
            f"{seg.interval_index}\t{seg.col_start}\t{seg.col_end}\t"
            + "\t".join(str(s) for s in seg.seqs)
            + "\n"
        )


def read_backbone_cols_file(src: Union[str, TextIO]) -> List[BackboneColumnSegment]:
    if isinstance(src, str):
        with open(src) as fh:
            return read_backbone_cols_file(fh)
    out = []
    for line in src:
        toks = line.replace(",", " ").split()
        if not toks:
            continue
        out.append(
            BackboneColumnSegment(
                int(toks[0]), int(toks[1]), int(toks[2]),
                [int(x) for x in toks[3:]],
            )
        )
    return out


def apply_backbone(
    ivs: IntervalList, segments: List[BackboneColumnSegment]
) -> IntervalList:
    """detectAndApplyBackbone's 'apply' step: split intervals at backbone
    boundaries so every emitted interval has a constant homologous sequence
    set; bases outside any backbone segment become unaligned single-seq
    intervals."""
    segs_by_iv: Dict[int, List[BackboneColumnSegment]] = {}
    for seg in merge_adjacent_segments(segments):
        segs_by_iv.setdefault(seg.interval_index, []).append(seg)
    new_intervals: List[Interval] = []
    for k, iv in enumerate(ivs.intervals):
        segs = sorted(segs_by_iv.get(k, []), key=lambda s: s.col_start)
        if not segs:
            new_intervals.append(iv)
            continue
        from mauvealigner_tpu.analysis.score_alignment import _interval_positions

        pos = {
            s: _interval_positions(iv, s)
            for s in range(iv.n_seqs)
            if iv.starts[s] != 0
        }
        consumed = {s: np.zeros(iv.n_cols, bool) for s in pos}
        for seg in segs:
            starts = np.zeros(iv.n_seqs, np.int64)
            aln = np.zeros((iv.n_seqs, seg.col_end - seg.col_start), bool)
            for s in seg.seqs:
                p = pos[s][seg.col_start : seg.col_end]
                nz = p != 0
                if not nz.any():
                    continue
                sign = int(np.sign(p[nz][0]))
                starts[s] = sign * int(np.abs(p[nz]).min())
                aln[s] = iv.aln[s, seg.col_start : seg.col_end]
                consumed[s][seg.col_start : seg.col_end] = True
            keep = aln.any(axis=0)
            if keep.any():
                new_intervals.append(Interval(starts, aln[:, keep]))
        # leftover bases per sequence -> unaligned single-seq intervals
        for s in pos:
            rest = iv.aln[s] & ~consumed[s]
            if not rest.any():
                continue
            p = pos[s][rest]
            p = p[p != 0]
            if not len(p):
                continue
            absp = np.sort(np.abs(p))
            # contiguous runs of positions
            breaks = np.nonzero(np.diff(absp) != 1)[0]
            run_starts = np.concatenate([[0], breaks + 1])
            run_ends = np.concatenate([breaks, [len(absp) - 1]])
            for a, b in zip(run_starts, run_ends):
                st = np.zeros(iv.n_seqs, np.int64)
                st[s] = int(absp[a])
                aln1 = np.zeros((iv.n_seqs, int(absp[b] - absp[a] + 1)), bool)
                aln1[s] = True
                new_intervals.append(Interval(st, aln1))
    return IntervalList(
        genomes=ivs.genomes,
        intervals=new_intervals,
        seq_filenames=list(ivs.seq_filenames),
        backbone_filename=ivs.backbone_filename,
    )

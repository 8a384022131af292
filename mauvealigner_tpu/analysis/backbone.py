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
import time

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


def _build_symbol_lut() -> np.ndarray:
    """6x6 code-pair -> symbol class table (codes 0-3 bases, 4 N, 5 gap)."""
    lut = np.full((6, 6), SYM_GAP, np.int8)
    lut[5, 5] = SYM_NONE
    for a in range(4):
        for b in range(4):
            if a == b:
                lut[a, b] = SYM_MATCH
            elif (a, b) in _TRANSITION_PAIRS:
                lut[a, b] = SYM_TRANSITION
            else:
                lut[a, b] = SYM_TRANSVERSION
    return lut


SYMBOL_LUT = _build_symbol_lut()


def column_symbols(
    iv: Interval, genomes: Sequence[Genome], i: int, j: int
) -> np.ndarray:
    """Symbol class per column for the (i, j) pairwise projection.

    Columns where both are gapped get SYM_NONE (emission-neutral: the
    reference scores the PROJECTED pair, which does not contain them, so a
    long third-sequence insertion must not drive the pair into Unrelated).
    """
    ci = _signed_codes_row(iv, genomes, i)
    cj = _signed_codes_row(iv, genomes, j)
    return SYMBOL_LUT[ci, cj]


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
    from mauvealigner_tpu.utils import timing

    t0 = time.perf_counter()
    jobs = []  # (key, chunk_start_in_compact, symbols_chunk)
    compact_idx: Dict[Tuple[int, int, int], np.ndarray] = {}
    full_len: Dict[Tuple[int, int, int], int] = {}
    for k, iv in enumerate(ivs.intervals):
        present = [s for s in range(iv.n_seqs) if iv.starts[s] != 0]
        # signed code rows once per (interval, seq) — every pair reuses them
        rows = {s: _signed_codes_row(iv, genomes, s) for s in present}
        for ai in range(len(present)):
            for bi in range(ai + 1, len(present)):
                i, j = present[ai], present[bi]
                sym_full = SYMBOL_LUT[rows[i], rows[j]]
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
    timing.GLOBAL.add("bb_symbols_s", time.perf_counter() - t0)
    out: Dict[Tuple[int, int, int], np.ndarray] = {}
    if not jobs:
        return out
    t0 = time.perf_counter()
    decoded = hmm_ops.bucketed_decode(
        [sym for (_, _, sym) in jobs],
        params.log_trans(),
        np.log([0.5, 0.5]),
        mode="posterior0" if threshold is None else "threshold0",
        threshold=0.5 if threshold is None else threshold,
        max_cols=max_cols,
        emit_table=params.log_emit_table(),  # [2, 4]; lookup runs on device
    )
    timing.GLOBAL.add("bb_decode_s", time.perf_counter() - t0)
    t0 = time.perf_counter()
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
    timing.GLOBAL.add("bb_stitch_s", time.perf_counter() - t0)
    return out


def pairwise_homology_bits(
    ivs: IntervalList,
    params: HmmParams,
    threshold: float = 0.5,
    max_cols: int = 1 << 16,
    overlap: int = 2048,
) -> Dict[Tuple[int, int, int], np.ndarray]:
    """Device-resident replacement for the detect_backbone consumer of
    pairwise_homology_posteriors: thresholded P(Homologous) per column for
    every (interval, i, j) projection, as bool arrays.

    The host path extracts a SYMBOL stream per PAIR (n^2/2 uploads per
    interval, host LUT + both-gap compaction + posterior stitch-back);
    here one uint8 code ROW per present (interval, seq) uploads once, and
    pair symbol classes, emission lookup, both-gap inert handling
    (identity chain elements — the projected-pair semantics), decode,
    thresholding and bit-packing all run on device
    (ops/hmm.pair_rows_state0_gt).  Reference analog: detectAndApplyBackbone
    scoring the pairwise projections, src/progressiveMauve.cpp:226-260.

    Chunking above max_cols stitches mid-overlap like the host path; the
    overlap is wider (2048 vs 512) because inert both-gap columns consume
    burn-in without advancing the projected chain.
    """
    genomes = ivs.genomes
    from mauvealigner_tpu.utils import timing

    t0 = time.perf_counter()
    row_blobs: List[np.ndarray] = []   # uint8 row slices, global ids
    jobs = []   # (key, col_start, global_i, global_j, width)
    out: Dict[Tuple[int, int, int], np.ndarray] = {}
    for k, iv in enumerate(ivs.intervals):
        present = [s for s in range(iv.n_seqs) if iv.starts[s] != 0]
        if len(present) < 2:
            continue
        rows = {
            s: _signed_codes_row(iv, genomes, s).view(np.uint8) for s in present
        }
        T_full = iv.n_cols
        if T_full <= max_cols:
            chunks = [(0, T_full)]
        else:
            step = max_cols - overlap
            chunks = []
            for a in range(0, T_full, step):
                b = min(a + max_cols, T_full)
                chunks.append((a, b))
                if b == T_full:
                    break
        for (a, b) in chunks:
            gidx = {}
            for s in present:
                gidx[s] = len(row_blobs)
                row_blobs.append(rows[s][a:b])
            for ai in range(len(present)):
                for bi in range(ai + 1, len(present)):
                    i, j = present[ai], present[bi]
                    key = (k, i, j)
                    if key not in out:
                        out[key] = np.zeros(T_full, bool)
                    jobs.append((key, a, gidx[i], gidx[j], b - a))
    timing.GLOBAL.add("bb_symbols_s", time.perf_counter() - t0)
    if not jobs:
        return out
    t0 = time.perf_counter()
    from mauvealigner_tpu.parallel import context as par_ctx

    # f64 transition chain over f32 emissions: the exact promotion the host
    # symbol path uses (x64 is globally enabled), so posteriors match it
    lt = jnp.asarray(params.log_trans())
    li = jnp.asarray(np.log([0.5, 0.5]))
    tab = jnp.asarray(params.log_emit_table().astype(np.float32).T)  # [4, 2]
    thr = jnp.asarray(float(threshold))
    buckets: Dict[int, List[int]] = {}
    for idx, (_, _, _, _, width) in enumerate(jobs):
        Tp = 1 << max(4, (width - 1).bit_length())
        buckets.setdefault(Tp, []).append(idx)
    for Tp, idxs in buckets.items():
        cap_pairs = max(8, (1 << 27) // (Tp * 16))
        for off in range(0, len(idxs), cap_pairs):
            chunk = [jobs[i] for i in idxs[off : off + cap_pairs]]
            uniq = sorted({g for (_, _, gi, gj, _) in chunk for g in (gi, gj)})
            loc = {g: n for n, g in enumerate(uniq)}
            Pp = 1 << max(1, (len(uniq) - 1).bit_length())
            rows_arr = np.full((Pp, Tp), 5, np.uint8)
            for g, n in loc.items():
                blob = row_blobs[g]
                rows_arr[n, : len(blob)] = blob
            B = 1 << max(3, (len(chunk) - 1).bit_length())
            ii = np.zeros(B, np.int32)
            jj = np.zeros(B, np.int32)
            lens = np.zeros(B, np.int32)
            for n, (_, _, gi, gj, width) in enumerate(chunk):
                ii[n], jj[n], lens[n] = loc[gi], loc[gj], width
            packed = par_ctx.shard_batched_call(
                lambda i2, j2, ln, rws, tb, t, ini, th: hmm_ops.pair_rows_state0_gt(
                    rws, i2, j2, tb, t, ini, ln, th
                ),
                [jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(lens)],
                (jnp.asarray(rows_arr), tab, lt, li, thr),
            )
            bits = np.unpackbits(packed, axis=1, bitorder="little").astype(bool)
            for n, (key, a, _, _, width) in enumerate(chunk):
                got = bits[n, :width]
                if a == 0:
                    out[key][a : a + width] = got
                else:
                    skip = overlap // 2
                    out[key][a + skip : a + width] = got[skip:]
    timing.GLOBAL.add("bb_decode_s", time.perf_counter() - t0)
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
    device_symbols: Optional[bool] = None,
) -> List[BackboneColumnSegment]:
    """detectBackbone + BigGapsDetector equivalents
    (src/progressiveMauve.cpp:242-243): per sequence per column, homologous
    iff some partner's pair-HMM posterior exceeds the threshold; gap runs
    longer than island_gap_size are never backbone.

    device_symbols routes the posterior pass through the device-resident
    row path (pairwise_homology_bits; default on — set
    MAUVE_HOST_BB_SYMBOLS=1 to force the host symbol path, which remains
    the cross-validation reference)."""
    import os

    if device_symbols is None:
        device_symbols = os.environ.get("MAUVE_HOST_BB_SYMBOLS", "") != "1"
    if device_symbols:
        posts = pairwise_homology_bits(ivs, params, threshold=posterior_threshold)
    else:
        posts = pairwise_homology_posteriors(
            ivs, params, threshold=posterior_threshold
        )
    from mauvealigner_tpu.utils import timing

    _t0 = time.perf_counter()
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
    timing.GLOBAL.add("bb_detect_s", time.perf_counter() - _t0)
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
    bb_seqentry_t rows).

    Chain merges only ever replace the growing row's RIGHT ends with the
    newest row's, so whether sorted row i joins row i-1's chain depends only
    on the ORIGINAL rows i and i-1 — the whole pass vectorizes as a pairwise
    joinability test + grouped first/last gather."""
    if not rows:
        return rows
    R = np.stack(rows).astype(np.int64, copy=False)
    n2 = R.shape[1]
    absent = R[:, ::2] == 0
    key2 = np.abs(R[:, 2]) if n2 > 2 else np.zeros(len(R), np.int64)
    # np.lexsort: last key is primary; mirror the reference tuple key
    # (membership bools, |left of seq0|, |left of seq1|)
    keys = [key2, np.abs(R[:, 0])] + [absent[:, s] for s in range(absent.shape[1] - 1, -1, -1)]
    order = np.lexsort(keys)
    S = R[order]
    mem = ~absent[order]
    if len(S) == 1:
        return [S[0].copy()]
    A, P = S[1:], S[:-1]
    same_mem = (mem[1:] == mem[:-1]).all(axis=1)
    al, pl, pr = A[:, ::2], P[:, ::2], P[:, 1::2]
    ok = (~mem[1:]) | ((np.abs(al) == np.abs(pr) + 1) & (np.sign(al) == np.sign(pl)))
    joinable = same_mem & ok.all(axis=1)
    newgrp = np.empty(len(S), bool)
    newgrp[0] = True
    newgrp[1:] = ~joinable
    firsts = np.nonzero(newgrp)[0]
    lasts = np.append(firsts[1:] - 1, len(S) - 1)
    out = S[firsts].copy()
    out[:, 1::2] = S[lasts][:, 1::2]
    return list(out)


def _segment_seq_coordinates(
    ivs: IntervalList,
    segments: List[BackboneColumnSegment],
    pos_cache: Optional[Dict[Tuple[int, int], np.ndarray]] = None,
) -> np.ndarray:
    """Signed per-seq [left, right] coordinate pairs for every segment, as a
    (n_segments, 2*n_seqs) int64 matrix (row order = segment order).

    Vectorized over segments: within one interval a present row's nonzero
    positions are strand-monotone (interval tiling invariant), so the min/max
    |position| over a column range are at the first/last nonzero column —
    O(1) lookups from cumulative first/last-nonzero scans per (interval, seq).
    """
    from mauvealigner_tpu.analysis.score_alignment import _interval_positions

    n = ivs.n_seqs
    coords = np.zeros((len(segments), 2 * n), np.int64)
    by_iv: Dict[int, List[int]] = {}
    for i, seg in enumerate(segments):
        by_iv.setdefault(seg.interval_index, []).append(i)
    for k, sidx in by_iv.items():
        iv = ivs.intervals[k]
        n_cols = iv.n_cols
        a = np.array([segments[i].col_start for i in sidx], np.int64)
        b1 = np.array([segments[i].col_end for i in sidx], np.int64) - 1
        counts = [len(segments[i].seqs) for i in sidx]
        member = np.zeros((len(sidx), n), bool)
        if sum(counts):
            flat_rows = np.repeat(np.arange(len(sidx)), counts)
            flat_cols = np.concatenate([segments[i].seqs for i in sidx]).astype(np.int64)
            member[flat_rows, flat_cols] = True
        arange = np.arange(n_cols, dtype=np.int64)
        for s in range(n):
            sel = member[:, s]
            if not sel.any() or int(iv.starts[s]) == 0:
                continue
            if pos_cache is not None:
                if (k, s) not in pos_cache:
                    pos_cache[(k, s)] = _interval_positions(iv, s)
                pos = pos_cache[(k, s)]
            else:
                pos = _interval_positions(iv, s)
            nz = pos != 0
            if not nz.any():
                continue
            last_nz = np.maximum.accumulate(np.where(nz, arange, np.int64(-1)))
            first_nz = np.minimum.accumulate(np.where(nz, arange, np.int64(n_cols))[::-1])[::-1]
            # python slicing clamps out-of-range column windows; mirror that
            aa = np.clip(a[sel], 0, n_cols - 1)
            bb = np.clip(b1[sel], 0, n_cols - 1)
            f = first_nz[aa]
            valid = (a[sel] < n_cols) & (b1[sel] >= 0) & (f <= bb)
            fc = np.where(valid, f, 0)
            lc = np.where(valid, last_nz[bb], 0)
            pf, pl = pos[fc], pos[lc]
            absf, absl = np.abs(pf), np.abs(pl)
            sign = np.sign(pf)
            lo = sign * np.minimum(absf, absl)
            hi = sign * np.maximum(absf, absl)
            rows = np.asarray(sidx, np.int64)[sel]
            coords[rows, 2 * s] = np.where(valid, lo, 0)
            coords[rows, 2 * s + 1] = np.where(valid, hi, 0)
    return coords


def backbone_seq_coordinates(
    ivs: IntervalList, segments: List[BackboneColumnSegment]
) -> List[np.ndarray]:
    """Per segment: signed per-seq [left, right] coordinate pairs
    (writeBackboneSeqCoordinates equivalent)."""
    return list(_segment_seq_coordinates(ivs, segments))


def add_unique_segments(
    rows: List[np.ndarray], ivs: IntervalList, seq_lengths: Sequence[int]
) -> List[np.ndarray]:
    """Append per-genome segments covered by no backbone row
    (addUniqueSegments equivalent): regions unique to one genome.

    Coverage fills with a range-difference array per genome — the
    per-row python slice loop was ~7M iterations at the headline scale."""
    n = ivs.n_seqs
    out = list(rows)
    R = np.abs(np.stack(rows).astype(np.int64)) if rows else None
    for s in range(n):
        glen = seq_lengths[s]
        if glen == 0:
            continue
        if R is not None:
            l, rr = R[:, 2 * s], R[:, 2 * s + 1]
            sel = l > 0
            delta = np.zeros(glen + 2, np.int32)
            np.add.at(delta, l[sel], 1)
            np.add.at(delta, np.minimum(rr[sel] + 1, glen + 1), -1)
            free = ~(np.cumsum(delta[: glen + 1])[1:] > 0)
        else:
            free = np.ones(glen, bool)
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
    from mauvealigner_tpu.utils import timing

    _t0 = time.perf_counter()
    merged = merge_adjacent_segments(segments)
    pos_cache: Dict[Tuple[int, int], np.ndarray] = {}
    coords = _segment_seq_coordinates(ivs, merged, pos_cache)
    segs_by_iv: Dict[int, List[int]] = {}
    for i, seg in enumerate(merged):
        segs_by_iv.setdefault(seg.interval_index, []).append(i)
    new_intervals: List[Interval] = []
    for k, iv in enumerate(ivs.intervals):
        sidx = sorted(segs_by_iv.get(k, []), key=lambda i: merged[i].col_start)
        if not sidx:
            new_intervals.append(iv)
            continue
        from mauvealigner_tpu.analysis.score_alignment import _interval_positions

        pos = {
            s: pos_cache.get((k, s)) if pos_cache.get((k, s)) is not None
            else _interval_positions(iv, s)
            for s in range(iv.n_seqs)
            if iv.starts[s] != 0
        }
        # consumed[s] = union of segment column ranges where s is a valid
        # member (coords nonzero <=> the reference's nz.any() gate)
        delta = {s: np.zeros(iv.n_cols + 1, np.int32) for s in pos}
        for i in sidx:
            seg = merged[i]
            for s in seg.seqs:
                if coords[i, 2 * s] != 0:
                    delta[s][seg.col_start] += 1
                    delta[s][seg.col_end] -= 1
        consumed = {s: np.cumsum(d[:-1]) > 0 for s, d in delta.items()}
        for i in sidx:
            seg = merged[i]
            starts = coords[i, ::2].copy()
            member_valid = starts != 0
            if not member_valid.any():
                continue
            aln = iv.aln[:, seg.col_start : seg.col_end] & member_valid[:, None]
            keep = aln.any(axis=0)
            if keep.all():
                new_intervals.append(Interval(starts, aln))
            elif keep.any():
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
    timing.GLOBAL.add("bb_apply_s", time.perf_counter() - _t0)
    return IntervalList(
        genomes=ivs.genomes,
        intervals=new_intervals,
        seq_filenames=list(ivs.seq_filenames),
        backbone_filename=ivs.backbone_filename,
    )

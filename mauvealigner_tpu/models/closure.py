"""Gapped closure: align the inter-anchor regions of an LCB.

Replaces the reference's per-region MUSCLE subprocess (Aligner::align gapped
phase, src/mauveAligner.cpp:674-676) with batched profile DP on device:
sequences join a growing profile star-progressively; each round every gap
region's (profile, next sequence) pair is bucketed and aligned in one batched
Gotoh call (ops/dp.py), so the device always sees large batches.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from mauvealigner_tpu.ops import dp

PROFILE_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _profile_from_rows(rows: List[Tuple[np.ndarray, np.ndarray]], n_cols: int) -> np.ndarray:
    """rows: list of (codes, gap_row bool[n_cols]); returns [n_cols, 5]."""
    prof = np.zeros((n_cols, 5), np.float32)
    for codes, row in rows:
        cols = np.nonzero(row)[0]
        prof[cols, np.minimum(codes[: len(cols)], 4)] += 1.0
    return prof


def _expand_rows(rows: List[np.ndarray], ops: np.ndarray) -> List[np.ndarray]:
    """Insert gap columns (where ops consumes only B) into existing rows."""
    consumes_a = (ops == dp.OP_DIAG) | (ops == dp.OP_UP)
    out = []
    for row in rows:
        new = np.zeros(len(ops), dtype=bool)
        new[consumes_a] = row
        out.append(new)
    return out


def align_region_groups(
    groups: Sequence[Sequence[np.ndarray]],
    subst: np.ndarray = dp.HOXD70,
    gap_open: float = dp.DEFAULT_GAP_OPEN,
    gap_extend: float = dp.DEFAULT_GAP_EXTEND,
    max_len: int = 4096,
) -> List[np.ndarray]:
    """Align many groups of regions (one group per anchor gap).

    groups[k] is the list of region code arrays (match-space oriented, may be
    empty) for gap k — one per participating sequence, in sequence order.
    Returns per-group boolean alignment matrices [n_regions, n_cols].

    Groups whose total width would exceed max_len fall back to unaligned
    block emission (the reference's --max-gapped-aligner-length behavior,
    src/mauveAligner.cpp:675-676).
    """
    n_groups = len(groups)
    results: List[Optional[np.ndarray]] = [None] * n_groups

    # state per group: list of (codes, row) merged so far, next region index
    state: List[List[Tuple[np.ndarray, np.ndarray]]] = []
    pending: List[List[int]] = []  # remaining region indices per group
    for k, regs in enumerate(groups):
        nz = [i for i, r in enumerate(regs) if len(r) > 0]
        if not nz:
            results[k] = np.zeros((len(regs), 0), dtype=bool)
            state.append([])
            pending.append([])
            continue
        if any(len(regs[i]) > max_len for i in nz):
            results[k] = _unaligned_blocks(regs)
            state.append([])
            pending.append([])
            continue
        first = nz[0]
        rows = [(np.asarray(regs[first]), np.ones(len(regs[first]), bool))]
        state.append(rows)
        pending.append(nz[1:])

    # star-progressive rounds: all groups advance one merge per round, batched
    while True:
        todo = [k for k in range(n_groups) if results[k] is None and pending[k]]
        if not todo:
            break
        profs, lens_a, lens_b, seqs_b = [], [], [], []
        active = []
        for k in todo:
            rows = state[k]
            n_cols = len(rows[0][1])
            nxt = pending[k][0]
            region = np.asarray(groups[k][nxt])
            if n_cols > max_len or len(region) > max_len:
                results[k] = _unaligned_blocks(groups[k])
                pending[k] = []
                continue
            prof = _profile_from_rows(rows, n_cols)
            active.append(k)
            profs.append(prof)
            lens_a.append(n_cols)
            lens_b.append(len(region))
            seqs_b.append(region)
        if not active:
            continue
        ops_all = _batched_profile_align(
            profs, lens_a, seqs_b, lens_b, subst, gap_open, gap_extend
        )
        for k, ops in zip(active, ops_all):
            rows = state[k]
            nxt = pending[k].pop(0)
            region = np.asarray(groups[k][nxt])
            old_rows = _expand_rows([r for _, r in rows], ops)
            new_row = (ops == dp.OP_DIAG) | (ops == dp.OP_LEFT)
            state[k] = [(c, nr) for (c, _), nr in zip(rows, old_rows)] + [(region, new_row)]

    # materialize remaining groups
    for k in range(n_groups):
        if results[k] is not None:
            continue
        regs = groups[k]
        rows = state[k]
        n_cols = len(rows[0][1]) if rows else 0
        aln = np.zeros((len(regs), n_cols), dtype=bool)
        nz = [i for i, r in enumerate(regs) if len(r) > 0]
        for (codes, row), i in zip(rows, nz):
            aln[i] = row
        results[k] = aln
    return results  # type: ignore[return-value]


def _unaligned_blocks(regs: Sequence[np.ndarray]) -> np.ndarray:
    """Emit each region as its own run of columns (no alignment)."""
    total = sum(len(r) for r in regs)
    aln = np.zeros((len(regs), total), dtype=bool)
    off = 0
    for i, r in enumerate(regs):
        aln[i, off : off + len(r)] = True
        off += len(r)
    return aln


def _batched_profile_align(
    profs: List[np.ndarray],
    lens_a: List[int],
    seqs_b: List[np.ndarray],
    lens_b: List[int],
    subst: np.ndarray,
    gap_open: float,
    gap_extend: float,
    memory_budget_bytes: int = 1 << 29,
) -> List[np.ndarray]:
    """Bucket (profile, sequence) pairs and run batched Gotoh."""
    results: List[Optional[np.ndarray]] = [None] * len(profs)
    groups: dict = {}
    for i in range(len(profs)):
        M = _bucket_of(lens_a[i])
        N = _bucket_of(lens_b[i])
        groups.setdefault((M, N), []).append(i)
    for (M, N), idxs in groups.items():
        per_elt = 5 * (M + N + 1) * (M + 1) + 4 * M * N
        bmax = max(1, min(128, memory_budget_bytes // per_elt))
        for off in range(0, len(idxs), bmax):
            chunk = idxs[off : off + bmax]
            B = len(chunk)
            pa = np.zeros((B, M, 5), np.float32)
            pb = np.zeros((B, N, 5), np.float32)
            la = np.zeros(B, np.int32)
            lb = np.zeros(B, np.int32)
            for j, i in enumerate(chunk):
                pa[j, : lens_a[i]] = profs[i][: lens_a[i]]
                pb[j] = dp.one_hot_profile(seqs_b[i], N)
                la[j], lb[j] = lens_a[i], lens_b[i]
            ops_list, _ = dp.align_profiles_batch(pa, pb, la, lb, subst, gap_open, gap_extend)
            for j, i in enumerate(chunk):
                results[i] = ops_list[j]
    return results  # type: ignore[return-value]


def _bucket_of(n: int) -> int:
    for b in PROFILE_BUCKETS:
        if n <= b:
            return b
    return PROFILE_BUCKETS[-1]

"""Hand-vectorized bitonic sort for the K1/K2 hot path.

XLA's variadic `lax.sort` on large 1D arrays runs far below the HBM
roofline on TPU (measured ~2 s for a 16M-entry 3-key sort — ~8% of the
bandwidth bound).  The network itself is tiny arithmetic: each
compare-exchange stage is an elementwise lexicographic comparison plus
selects over partner pairs, and with a power-of-two stride every pairing is
expressible as a reshape — no gathers, no lane shuffles, pure VPU work.
This module unrolls the full bitonic network (log2(n)*(log2(n)+1)/2
stages) into one jitted program of reshaped compare-exchange stages.

Replaces lax.sort in merops/matchops (reference sort call sites:
libMems SML sorting and MemHash seed bucketing — SURVEY.md L1/L2).

Determinism note: bitonic networks are not stable.  Every call site sorts
tuples that are globally unique ((mer, pos), (mer, seq, pos), signature
tuples with a distinct segment id), so the sorted order is unique and
stability is irrelevant; `bitonic_sort` asserts nothing but callers must
keep that invariant (see each call site's comment).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _lex_gt(a_lanes, b_lanes, num_keys: int):
    """a > b under lexicographic order of the first num_keys lanes."""
    gt = None
    eq = None
    for k in range(num_keys):
        a, b = a_lanes[k], b_lanes[k]
        gt_k = a > b
        if gt is None:
            gt = gt_k
            eq = a == b
        else:
            gt = gt | (eq & gt_k)
            if k + 1 < num_keys:
                eq = eq & (a == b)
    return gt


def _compare_exchange(lanes, num_keys: int, j: int, k: int):
    """One bitonic stage: partner pairs (i, i^j) with direction from bit k.

    j is the stride (power of two); within every 2j block the first j
    elements pair with the second j.  All elements of a block share the
    same value of (i & k) because 2j <= k, so the sort direction is
    constant per block.
    """
    n = lanes[0].shape[0]
    blocks = n // (2 * j)
    a_lanes = []
    b_lanes = []
    for x in lanes:
        xr = x.reshape(blocks, 2, j)
        a_lanes.append(xr[:, 0])
        b_lanes.append(xr[:, 1])
    # ascending where (block_start & k) == 0
    block_start = (jnp.arange(blocks, dtype=jnp.int64) * (2 * j))
    asc = ((block_start & k) == 0)[:, None]  # [blocks, 1]
    gt = _lex_gt(a_lanes, b_lanes, num_keys)
    swap = jnp.where(asc, gt, ~gt)
    out = []
    for a, b in zip(a_lanes, b_lanes):
        na = jnp.where(swap, b, a)
        nb = jnp.where(swap, a, b)
        out.append(jnp.stack([na, nb], axis=1).reshape(n))
    return tuple(out)


def _bitonic_network(lanes, num_keys: int):
    n = lanes[0].shape[0]
    m = n.bit_length() - 1  # n is a power of two
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            lanes = _compare_exchange(lanes, num_keys, j, k)
            j //= 2
        k *= 2
    return lanes


def _pad_value(dtype) -> int:
    if dtype == jnp.uint32 or dtype == np.uint32:
        return np.uint32(0xFFFFFFFF)
    if dtype == jnp.int64 or dtype == np.int64:
        return np.int64(np.iinfo(np.int64).max)
    return np.int32(np.iinfo(np.int32).max)


@partial(jax.jit, static_argnames=("num_keys",))
def bitonic_sort(operands: Tuple[jnp.ndarray, ...], num_keys: int):
    """Ascending lexicographic sort of parallel 1D arrays.

    Drop-in for ``jax.lax.sort(operands, num_keys=num_keys)`` on int32 /
    uint32 / int64 lanes, with two caveats: the result order is unique only
    when the key tuples are (callers here guarantee it), and the first key
    lane must never hold its dtype maximum (used as the internal padding
    sentinel; mer keys, window positions and signature hashes all stay
    below it).
    """
    n = int(operands[0].shape[0])
    if n <= 1:
        return tuple(operands)
    n_pad = 1 << (n - 1).bit_length()
    lanes = []
    for li, x in enumerate(operands):
        if n_pad != n:
            pv = _pad_value(x.dtype) if li == 0 else x.dtype.type(0)
            x = jnp.concatenate([x, jnp.full(n_pad - n, pv, x.dtype)])
        lanes.append(x)
    lanes = _bitonic_network(tuple(lanes), num_keys)
    if n_pad != n:
        lanes = tuple(x[:n] for x in lanes)
    return tuple(lanes)

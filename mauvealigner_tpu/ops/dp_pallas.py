"""Pallas TPU kernel for the Gotoh wavefront (K3 hot loop).

The XLA `lax.scan` version (ops/dp.py) materializes per-step HLO; this
kernel fuses the whole anti-diagonal recurrence into one Mosaic program.

Layout (v2, batch-in-sublane): each grid row processes EIGHT batch elements
at once — element r of the group lives in sublane r, so every (8, Sp) vector
op uses the VPU's full 8x128 tile instead of 1/8th of it (the v1 per-element
layout was 1.8x SLOWER than the scan; this one beats it).  Diagonals are
processed in chunks of CH so the skewed-score input and decision output
stream through VMEM ((1, CH, 8, Sp) blocks) while the four state rows
persist in (8, Sp) scratch across the chunk grid dimension.

Skewed scores ship as bfloat16: HOXD-class integer scores (|s| <= 256) are
exact in bf16, halving the score bandwidth; the recurrence itself
accumulates in f32, so tracebacks stay bit-identical to the scan path.

All integer literals are pinned to int32 (see CLAUDE.md: global x64 makes
Python ints weak-i64, which Mosaic cannot demote — trace-time recursion or
server-side 'failed to legalize func.func' errors).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# np.float32 (not a Python float, which is weak-f64 under global x64 and
# drags the whole kernel into f64; not a jnp scalar, which would be a
# captured const in the kernel)
NEG = np.float32(-1e9)
F0 = np.float32(0.0)

PALLAS_MAX_S = 4096
GROUP = 8          # batch elements per grid row (one per sublane)


def _chunk_for(sp: int) -> int:
    """Diagonals per grid step: as LARGE as VMEM allows — measured per-grid-
    step overhead (~30 us/chunk) bounds the kernel well before the
    recurrence math, so fewer/bigger chunks win.  The streamed blocks are
    sskew (CH, 8, sp) bf16 + dec (CH, 8, sp) u8 = 24*CH*sp bytes per buffer;
    keep two double-buffered copies under ~8 MB."""
    budget = 1 << 23  # bytes for 2 x (sskew + dec) buffers
    ch = 32
    while ch < 256 and 2 * 24 * (ch * 2) * sp <= budget:
        ch *= 2
    return ch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(gaps_ref, ma_ref, mb_ref, sskew_ref, dec_ref, score_ref,
            h_ref, h2_ref, e_ref, f_ref, cap_ref):
    """One chunk of diagonals for one 8-element group.

    gaps_ref:  scalar-prefetch (2,) f32 — (gap_open+gap_extend, gap_extend)
               (per-element lengths live in ma/mb VMEM operands, NOT in
               scalar prefetch: a (B, 2) SMEM operand is lane-padded to
               (B, 128) and overflows the 1MB SMEM at B = 2048)
    ma_ref:    VMEM (1, 8, 128) i32 — per-sublane mA, broadcast across lanes
    mb_ref:    VMEM (1, 8, 128) i32 — per-sublane mB
    sskew_ref: VMEM (1, CH, 8, Sp) bf16 — S_skew[d, r, i] = S_r[i-1, d-i-1]
    dec_ref:   VMEM (1, CH, 8, Sp) i32 out — decision bits per cell
    score_ref: VMEM (1, 8, 128) f32 out — H[mA, mB] per sublane (all lanes)
    h/h2/e/f:  VMEM (8, Sp) f32 scratch, persistent across the chunk dim
    cap_ref:   VMEM (8, Sp) f32 scratch — elementwise capture of H[mA, mB]

    The final-cell capture is ELEMENTWISE into cap_ref (mask + where per
    diagonal) with a single lane-reduction at the very end: a per-diagonal
    reduce + sublane broadcast + output RMW costs ~43us/iteration on this
    backend and dominated everything else in the sweep (~1.6us/iteration).
    """
    sp = h_ref.shape[1]
    ch = sskew_ref.shape[1]
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, sp), 1)
    is_lane0 = lane == 0
    lane_ge1 = lane >= 1
    ma128 = ma_ref[0]                          # (8, 128)
    d_final128 = ma128 + mb_ref[0]
    # per-sublane capture target: element r's final cell H[mA, mB] lives in
    # lane mA on diagonal mA+mB — folding both conditions into ONE per-lane
    # target diagonal makes the in-loop capture predicate a single compare
    # (the kernel is VPU-issue-bound: ~45 vector ops/diagonal owned the
    # measured ~370ns/diagonal, so every hoisted op counts)
    ma_sp = jnp.broadcast_to(ma128[:, :1], (GROUP, sp))
    dfin_sp = ma_sp + jnp.broadcast_to(mb_ref[0][:, :1], (GROUP, sp))
    target_d = jnp.where(lane == ma_sp, dfin_sp, jnp.int32(-1))

    go_ge = gaps_ref[0]
    ge = gaps_ref[1]

    @pl.when(c == jnp.int32(0))
    def _init():
        h_ref[:, :] = jnp.where(is_lane0, F0, NEG)
        h2_ref[:, :] = jnp.full((GROUP, sp), NEG)
        e_ref[:, :] = jnp.full((GROUP, sp), NEG)
        f_ref[:, :] = jnp.full((GROUP, sp), NEG)
        cap_ref[:, :] = jnp.zeros((GROUP, sp), jnp.float32)
        # diagonal 0 is pure init: its decision row is all zero and the
        # sweep loop starts at diagonal 1 (peeling it removes the `live`
        # select from every state write of every diagonal)
        dec_ref[0, jnp.int32(0)] = jnp.zeros((GROUP, sp), jnp.uint8)

    def shift_down(x):
        rolled = pltpu.roll(x, shift=jnp.int32(1), axis=1)
        return jnp.where(is_lane0, NEG, rolled)

    def body(dl, carry):
        d = c * jnp.int32(ch) + dl             # global diagonal index
        h_prev = h_ref[:, :]
        h_prev2 = h2_ref[:, :]
        e_prev = e_ref[:, :]
        f_prev = f_ref[:, :]
        j = d - lane

        e_from_h = h_prev + go_ge
        e_from_e = e_prev + ge
        e_open = e_from_h >= e_from_e
        e_val = jnp.where(j >= 1, jnp.maximum(e_from_h, e_from_e), NEG)

        hp1 = shift_down(h_prev)
        fp1 = shift_down(f_prev)
        f_from_h = hp1 + go_ge
        f_from_f = fp1 + ge
        f_open = f_from_h >= f_from_f
        f_val = jnp.where(lane_ge1, jnp.maximum(f_from_h, f_from_f), NEG)

        sdiag = sskew_ref[0, dl].astype(jnp.float32)   # (8, Sp)
        hd = shift_down(h_prev2) + sdiag  # invalid cells stay ~NEG via sdiag mask

        # priority diag > up(F) > left(E); strict > keeps the earlier choice
        best = hd
        choice = jnp.zeros((GROUP, sp), jnp.int32)
        better_f = f_val > best
        best = jnp.where(better_f, f_val, best)
        choice = jnp.where(better_f, jnp.int32(1), choice)
        better_e = e_val > best
        best = jnp.where(better_e, e_val, best)
        choice = jnp.where(better_e, jnp.int32(2), choice)

        zero = jnp.int32(0)
        dec = (
            choice
            | jnp.where(e_open, jnp.int32(4), zero)
            | jnp.where(f_open, jnp.int32(8), zero)
        )
        # uint8 store: 4 bits/cell of decision in 1 byte instead of 4 — the
        # dec matrix dominates both the kernel's HBM writes and the VMEM
        # block budget at the 1024-4096 buckets
        dec_ref[0, dl] = dec.astype(jnp.uint8)
        h2_ref[:, :] = h_prev
        h_ref[:, :] = best
        e_ref[:, :] = e_val
        f_ref[:, :] = f_val

        # elementwise capture of each element's final cell H[mA, mB]
        cap_ref[:, :] = jnp.where(d == target_d, best, cap_ref[:, :])
        return carry

    start = jnp.where(c == jnp.int32(0), jnp.int32(1), jnp.int32(0))
    jax.lax.fori_loop(start, jnp.int32(ch), body, jnp.int32(0))

    @pl.when(c == n_chunks - jnp.int32(1))
    def _emit_scores():
        pick = jnp.sum(cap_ref[:, :], axis=1, keepdims=True)  # (8, 1)
        score_ref[0] = jnp.where(
            d_final128 == 0, F0, jnp.broadcast_to(pick, (GROUP, 128))
        )


@partial(jax.jit, static_argnames=("M", "N", "interpret"))
def gotoh_forward_pallas(
    pA: jnp.ndarray,      # [B, M, 5] f32
    pB: jnp.ndarray,      # [B, N, 5] f32
    lens_a: jnp.ndarray,  # [B] int32
    lens_b: jnp.ndarray,  # [B] int32
    subst: jnp.ndarray,   # [5, 5] f32
    gap_open: jnp.ndarray,
    gap_extend: jnp.ndarray,
    M: int,
    N: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (scores [B] f32, dec [B, n_diags, M+1] uint8) — drop-in for
    dp.gotoh_forward_scored on square buckets with M == N <= PALLAS_MAX_S."""
    B = pA.shape[0]
    n_diags = M + N + 1
    sp = _round_up(M + 1, 128)
    CHUNK = _chunk_for(sp)
    nd_p = _round_up(n_diags, CHUNK)
    Bp = _round_up(max(B, GROUP), GROUP)
    G = Bp // GROUP

    la = jnp.zeros(Bp, jnp.int32).at[:B].set(lens_a.astype(jnp.int32))
    lb = jnp.zeros(Bp, jnp.int32).at[:B].set(lens_b.astype(jnp.int32))

    # MXU outside the kernel: full score matrix, then skewed so the kernel
    # reads one (8, Sp) tile per anti-diagonal.  The skew is a SHEAR done
    # with pad+reshape (zero gathers): padding every row of S with M zeros
    # and re-rowing the flat buffer at width W-1 shifts row i right by i, so
    # Q[b, i, c] = S[b, i, c - i] and anti-diagonal d is column d-2 of Q.
    # (The original take_along_axis gather cost ~700ms at B=256, M=256 —
    # 25x the whole wavefront sweep.)
    S = jnp.einsum("bik,kl,bjl->bij", pA, subst, pB, preferred_element_type=jnp.float32)
    W = M + N
    Spad = jnp.pad(S, ((0, 0), (0, 0), (0, M)))           # (B, M, W)
    Q = Spad.reshape(B, M * W)[:, : M * (W - 1)].reshape(B, M, W - 1)
    QT = jnp.transpose(Q.astype(jnp.bfloat16), (0, 2, 1))  # (B, W-1, M)
    # sskew[d, i] = QT[d-2, i-1]; shear wrap-around lands in the zero padding
    # (j outside [1, N] reads 0, which never feeds a valid cell — see kernel)
    skew_b = jnp.pad(
        QT,
        ((0, 0), (2, nd_p - (W - 1) - 2), (1, sp - M - 1)),
        constant_values=NEG,
    )
    if Bp != B:
        skew_b = jnp.concatenate(
            [skew_b, jnp.full((Bp - B, nd_p, sp), NEG, jnp.bfloat16)], axis=0
        )
    # [Bp, nd, sp] -> [G, nd, 8, sp]: element r of group g sits in sublane r
    sskew = jnp.transpose(skew_b.reshape(G, GROUP, nd_p, sp), (0, 2, 1, 3))

    gaps = jnp.stack([
        (gap_open + gap_extend).astype(jnp.float32),
        gap_extend.astype(jnp.float32),
    ])
    ma_in = jnp.broadcast_to(la.reshape(G, GROUP, 1), (G, GROUP, 128)).astype(jnp.int32)
    mb_in = jnp.broadcast_to(lb.reshape(G, GROUP, 1), (G, GROUP, 128)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, nd_p // CHUNK),
        # index maps return jnp.int32: Python-int offsets become i64 under
        # global x64 and the transform function fails legalization
        in_specs=[
            pl.BlockSpec((1, GROUP, 128), lambda g, c, gp: (g, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, 128), lambda g, c, gp: (g, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, GROUP, sp), lambda g, c, gp: (g, c, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CHUNK, GROUP, sp), lambda g, c, gp: (g, c, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP, 128), lambda g, c, gp: (g, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, sp), jnp.float32),
            pltpu.VMEM((GROUP, sp), jnp.float32),
            pltpu.VMEM((GROUP, sp), jnp.float32),
            pltpu.VMEM((GROUP, sp), jnp.float32),
            pltpu.VMEM((GROUP, sp), jnp.float32),
        ],
    )

    dec, scores = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, nd_p, GROUP, sp), jnp.uint8),
            jax.ShapeDtypeStruct((G, GROUP, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(gaps, ma_in, mb_in, sskew)
    # [G, nd, 8, sp] -> [B, n_diags, M+1]
    dec_u8 = (
        jnp.transpose(dec, (0, 2, 1, 3))
        .reshape(Bp, nd_p, sp)[:B, :n_diags, : M + 1]
    )
    return scores.reshape(Bp, 128)[:B, 0], dec_u8

"""Pallas TPU kernel for the Gotoh wavefront (K3 hot loop).

The XLA `lax.scan` version (ops/dp.py) materializes per-step HLO; this
kernel fuses the whole anti-diagonal recurrence into one Mosaic program per
batch element: the four state rows (H, H2, E, F) live in VMEM for the entire
sweep, the pre-skewed substitution-score rows are read from the VMEM-resident
input block, and only the 4-bit decision rows leave the core.

Scope: square buckets with S <= 512 (skewed scores + decisions fit VMEM);
larger buckets fall back to the scan implementation.  Layout: rows are
(1, Sp) vectors with Sp = ceil(S+1, 128) lanes; lane shifts use pltpu.roll.
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

PALLAS_MAX_S = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_diags, lens_ref, gaps_ref, sskew_ref, dec_ref, score_ref, h_ref, h2_ref, e_ref, f_ref):
    """One batch element's full wavefront.

    n_diags:   static true diagonal count (refs are padded to a multiple of 8)
    lens_ref:  scalar-prefetch (B, 2) int32 — (mA, mB) per element
    gaps_ref:  scalar-prefetch (2,) f32 — (gap_open+gap_extend, gap_extend)
    sskew_ref: VMEM (nd_p, Sp) f32 — S_skew[d, i] = S[i-1, d-i-1]
    dec_ref:   VMEM (nd_p, Sp) int32 out — decision bits per cell
    score_ref: VMEM (8, 128) f32 out — H[mA, mB] broadcast across the tile
    h/h2/e/f:  VMEM (1, Sp) f32 scratch
    """
    sp = sskew_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1)
    b = pl.program_id(0)
    ma = lens_ref[b, 0]
    mb = lens_ref[b, 1]
    d_final = ma + mb

    go_ge = gaps_ref[0]
    ge = gaps_ref[1]

    h_ref[:, :] = jnp.where(lane == 0, F0, NEG)
    h2_ref[:, :] = jnp.full((1, sp), NEG)
    e_ref[:, :] = jnp.full((1, sp), NEG)
    f_ref[:, :] = jnp.full((1, sp), NEG)
    dec_ref[0, :] = jnp.zeros(sp, jnp.int32)
    score_ref[:, :] = jnp.full((8, 128), jnp.where(d_final == 0, F0, NEG))

    def shift_down(x):
        rolled = pltpu.roll(x, shift=jnp.int32(1), axis=1)
        return jnp.where(lane == 0, NEG, rolled)

    def body(d, carry):
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
        f_val = jnp.where(lane >= 1, jnp.maximum(f_from_h, f_from_f), NEG)

        sdiag = sskew_ref[pl.ds(d, 1), :]
        hd = shift_down(h_prev2) + sdiag  # invalid cells stay ~NEG via sdiag mask

        # priority diag > up(F) > left(E); strict > keeps the earlier choice.
        # int literals must be pinned to int32: under global x64 a Python int
        # is weak-i64 and Mosaic's i64->i32 demotion recurses forever
        best = hd
        choice = jnp.zeros((1, sp), jnp.int32)
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
        dec_ref[pl.ds(d, 1), :] = dec
        h2_ref[:, :] = h_prev
        h_ref[:, :] = best
        e_ref[:, :] = e_val
        f_ref[:, :] = f_val

        @pl.when(d == d_final)
        def _():
            picked = jnp.sum(jnp.where(lane == ma, best, F0))
            score_ref[:, :] = jnp.full((8, 128), picked)

        return carry

    # int32 loop index: under global x64 a Python-int bound makes the index
    # i64, and Mosaic's i64->i32 demotion rule recurses forever
    jax.lax.fori_loop(jnp.int32(1), jnp.int32(n_diags), body, jnp.int32(0))


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
    nd_p = _round_up(n_diags, 8)  # Mosaic slices need 8-aligned sublanes
    sp = _round_up(M + 1, 128)

    # MXU outside the kernel: full score matrix, then skewed so the kernel
    # reads one contiguous row per anti-diagonal
    S = jnp.einsum("bik,kl,bjl->bij", pA, subst, pB, preferred_element_type=jnp.float32)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (nd_p, sp), 0)
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (nd_p, sp), 1)
    j_ids = d_ids - i_ids
    valid = (i_ids >= 1) & (i_ids <= M) & (j_ids >= 1) & (j_ids <= N)
    flat = jnp.clip((i_ids - 1) * N + (j_ids - 1), 0, M * N - 1)
    sskew = jnp.where(
        valid[None], jnp.take_along_axis(S.reshape(B, -1)[:, None, :],
                                         jnp.broadcast_to(flat.reshape(1, 1, -1), (B, 1, nd_p * sp)),
                                         axis=2).reshape(B, nd_p, sp),
        NEG,
    )
    lens = jnp.stack([lens_a.astype(jnp.int32), lens_b.astype(jnp.int32)], axis=1)
    gaps = jnp.stack([
        (gap_open + gap_extend).astype(jnp.float32),
        gap_extend.astype(jnp.float32),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        # index maps return jnp.int32 zeros: Python-int block offsets become
        # i64 under global x64 and the transform function fails legalization
        in_specs=[
            pl.BlockSpec((1, nd_p, sp),
                         lambda b, lens, gaps: (b, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nd_p, sp),
                         lambda b, lens, gaps: (b, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda b, lens, gaps: (b, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, sp), jnp.float32),
            pltpu.VMEM((1, sp), jnp.float32),
            pltpu.VMEM((1, sp), jnp.float32),
            pltpu.VMEM((1, sp), jnp.float32),
        ],
    )

    def kernel(lens_blk, gaps_blk, sskew_blk, dec_blk, score_blk, h, h2, e, f):
        # jnp.int32 index: a Python-int 0 becomes an i64 memref_slice operand
        # under global x64, which Mosaic rejects
        z = jnp.int32(0)
        _kernel(
            n_diags,
            lens_blk,
            gaps_blk,
            sskew_blk.at[z],
            dec_blk.at[z],
            score_blk.at[z],
            h, h2, e, f,
        )

    dec, scores = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, nd_p, sp), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lens, gaps, sskew)
    dec_u8 = dec[:, :n_diags, : M + 1].astype(jnp.uint8)
    return scores[:, 0, 0], dec_u8

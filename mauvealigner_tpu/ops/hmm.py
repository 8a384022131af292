"""K4: hidden-Markov-model scans (homology HMM forward/backward).

TPU-native replacement for libMems' HomologyHMM (reference call sites
src/progressiveMauve.cpp:226-260, src/repeatoire.cpp:1324).  The pair-HMM
posterior decoding over alignment columns is expressed as log-space
forward/backward scans, batched over many pairwise projections at once.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


@partial(jax.jit, static_argnames=())
def forward_backward(
    log_emit: jnp.ndarray,   # [B, T, S] per-step emission log-probs
    log_trans: jnp.ndarray,  # [S, S] log transition matrix (row=from)
    log_init: jnp.ndarray,   # [S]
    lengths: jnp.ndarray,    # [B] actual sequence lengths (<= T)
) -> jnp.ndarray:
    """Returns posterior state probabilities [B, T, S].

    Steps beyond `lengths` are padding: they must not influence the
    backward pass, which is achieved by giving padding steps zero emission
    log-prob (identity contribution).
    """
    B, T, S = log_emit.shape
    step_ids = jnp.arange(T)
    pad_mask = step_ids[None, :] < lengths[:, None]  # [B, T]
    le = jnp.where(pad_mask[:, :, None], log_emit, 0.0)

    def fwd_step(alpha, e_t):
        # alpha: [B, S]; e_t: [B, S]
        a = jax.nn.logsumexp(alpha[:, :, None] + log_trans[None], axis=1) + e_t
        return a, a

    alpha0 = log_init[None] + le[:, 0]
    _, alphas = jax.lax.scan(fwd_step, alpha0, jnp.moveaxis(le[:, 1:], 1, 0))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]

    def bwd_step(beta, e_next):
        b = jax.nn.logsumexp(log_trans[None] + (e_next + beta)[:, None, :], axis=2)
        return b, b

    beta_T = jnp.zeros((B, S))
    _, betas = jax.lax.scan(
        bwd_step, beta_T, jnp.moveaxis(le[:, 1:], 1, 0), reverse=True
    )
    betas = jnp.concatenate([betas, beta_T[None]], axis=0)  # [T, B, S]

    log_post = alphas + betas
    log_post = log_post - jax.nn.logsumexp(log_post, axis=2, keepdims=True)
    post = jnp.exp(jnp.moveaxis(log_post, 0, 1))  # [B, T, S]
    return jnp.where(pad_mask[:, :, None], post, 0.0)


@jax.jit
def viterbi(
    log_emit: jnp.ndarray,   # [B, T, S]
    log_trans: jnp.ndarray,  # [S, S]
    log_init: jnp.ndarray,   # [S]
    lengths: jnp.ndarray,    # [B]
) -> jnp.ndarray:
    """Most-likely state path [B, T] (int32; padding steps repeat last state)."""
    B, T, S = log_emit.shape
    step_ids = jnp.arange(T)
    pad_mask = step_ids[None, :] < lengths[:, None]
    le = jnp.where(pad_mask[:, :, None], log_emit, 0.0)

    def vit_step(delta, e_t):
        scores = delta[:, :, None] + log_trans[None]  # [B, S_from, S_to]
        best_from = jnp.argmax(scores, axis=1)
        d = jnp.max(scores, axis=1) + e_t
        return d, best_from

    delta0 = log_init[None] + le[:, 0]
    deltaT, backs = jax.lax.scan(vit_step, delta0, jnp.moveaxis(le[:, 1:], 1, 0))

    last = jnp.argmax(deltaT, axis=1)

    def bt_step(state, back_t):
        prev = jnp.take_along_axis(back_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, path_rev = jax.lax.scan(bt_step, last, backs, reverse=True)
    path = jnp.concatenate([path_rev, last[None]], axis=0)  # [T, B]
    return jnp.moveaxis(path, 0, 1).astype(jnp.int32)

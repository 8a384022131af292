"""Pallas Gotoh kernel vs the XLA scan implementation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mauvealigner_tpu.ops import dp
from mauvealigner_tpu.ops.dp_pallas import gotoh_forward_pallas


def _random_batch(rng, B, M, N):
    pa = np.zeros((B, M, 5), np.float32)
    pb = np.zeros((B, N, 5), np.float32)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for b in range(B):
        x = rng.integers(0, 4, size=int(rng.integers(2, M + 1)))
        y = rng.integers(0, 4, size=int(rng.integers(2, N + 1)))
        pa[b] = dp.one_hot_profile(x, M)
        pb[b] = dp.one_hot_profile(y, N)
        la[b], lb[b] = len(x), len(y)
    return pa, pb, la, lb


@pytest.mark.parametrize("M", [16, 48])
def test_pallas_matches_scan(rng, M):
    B, N = 4, M
    pa, pb, la, lb = _random_batch(rng, B, M, N)
    subst = jnp.asarray(dp.HOXD70)
    go, ge = jnp.float32(-400.0), jnp.float32(-30.0)
    s_ref, dec_ref = dp.gotoh_forward_scored(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(la), jnp.asarray(lb),
        subst, go, ge, M, N,
    )
    s_pal, dec_pal = gotoh_forward_pallas(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(la), jnp.asarray(lb),
        subst, go, ge, M, N, interpret=True,
    )
    assert np.allclose(np.asarray(s_ref), np.asarray(s_pal), atol=1e-3)
    # decision bytes must agree on every reachable cell: compare tracebacks
    ops_ref, cnt_ref = dp.gotoh_traceback(dec_ref, jnp.asarray(la), jnp.asarray(lb), M, N)
    ops_pal, cnt_pal = dp.gotoh_traceback(dec_pal, jnp.asarray(la), jnp.asarray(lb), M, N)
    assert np.array_equal(np.asarray(cnt_ref), np.asarray(cnt_pal))
    assert np.array_equal(np.asarray(ops_ref), np.asarray(ops_pal))


@pytest.mark.slow
def test_pallas_matches_scan_large_bucket(rng):
    """The 1024-4096 closure buckets run the kernel with the reduced-CHUNK /
    uint8-dec configuration; pin traceback identity at 1024 (4096 is
    interpret-mode-prohibitive; the real-backend compile check covers it)."""
    B, M = 2, 1024
    pa, pb, la, lb = _random_batch(rng, B, M, M)
    subst = jnp.asarray(dp.HOXD70)
    go, ge = jnp.float32(-400.0), jnp.float32(-30.0)
    s_ref, dec_ref = dp.gotoh_forward_scored(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(la), jnp.asarray(lb),
        subst, go, ge, M, M,
    )
    s_pal, dec_pal = gotoh_forward_pallas(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(la), jnp.asarray(lb),
        subst, go, ge, M, M, interpret=True,
    )
    assert np.allclose(np.asarray(s_ref), np.asarray(s_pal), atol=1e-3)
    ops_ref, cnt_ref = dp.gotoh_traceback(dec_ref, jnp.asarray(la), jnp.asarray(lb), M, M)
    ops_pal, cnt_pal = dp.gotoh_traceback(dec_pal, jnp.asarray(la), jnp.asarray(lb), M, M)
    assert np.array_equal(np.asarray(cnt_ref), np.asarray(cnt_pal))
    assert np.array_equal(np.asarray(ops_ref), np.asarray(ops_pal))

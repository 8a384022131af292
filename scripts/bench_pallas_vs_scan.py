"""Micro-bench: Pallas Gotoh kernel vs the XLA scan path on the current platform.

Usage: python scripts/bench_pallas_vs_scan.py [M] [B]
"""

import os
import sys
import time

sys.setrecursionlimit(100000)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mauvealigner_tpu.ops import dp
from mauvealigner_tpu.ops.dp_pallas import gotoh_forward_pallas

M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N = M

rng = np.random.default_rng(0)
pa = np.zeros((B, M, 5), np.float32)
pb = np.zeros((B, N, 5), np.float32)
la = np.zeros(B, np.int32)
lb = np.zeros(B, np.int32)
for b in range(B):
    x = rng.integers(0, 4, size=M)
    y = rng.integers(0, 4, size=N)
    pa[b] = dp.one_hot_profile(x, M)
    pb[b] = dp.one_hot_profile(y, N)
    la[b], lb[b] = M, N

subst = jnp.asarray(dp.HOXD70)
go, ge = jnp.float32(-400.0), jnp.float32(-30.0)
jpa, jpb = jnp.asarray(pa), jnp.asarray(pb)
jla, jlb = jnp.asarray(la), jnp.asarray(lb)


def run(fn, label):
    t0 = time.time()
    s, d = fn()
    jax.block_until_ready((s, d))
    cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        s, d = fn()
        jax.block_until_ready((s, d))
        times.append(time.time() - t0)
    print(f"{label}: cold {cold:.2f}s warm {min(times)*1e3:.1f}ms", flush=True)
    return np.asarray(s)


s_scan = run(
    lambda: dp.gotoh_forward_scored(jpa, jpb, jla, jlb, subst, go, ge, M, N),
    f"scan   M={M} B={B}",
)
s_pal = run(
    lambda: gotoh_forward_pallas(jpa, jpb, jla, jlb, subst, go, ge, M, N),
    f"pallas M={M} B={B}",
)
print("scores match:", np.allclose(s_scan, s_pal, atol=1e-2))

"""Per-primitive timing at K2 scale on the TPU (scatters/gathers/scans).

Usage: python scripts/profile_k2_prims.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, reps=3):
    outs = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(outs)[0][-1])  # fence (cold)
    times = []
    for _ in range(reps):
        t0 = time.time()
        outs = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(outs)[0][-1])
        times.append(time.time() - t0)
    print(f"{name:34s} {min(times)*1e3:9.1f} ms", flush=True)


def main(n):
    rng = np.random.default_rng(37)
    idx_dup = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, n, n)).astype(np.int32))
    seg_id = jnp.asarray(np.minimum(np.cumsum(rng.random(n) < 0.3), n - 1).astype(np.int32))
    vals64 = jnp.asarray(rng.integers(-(2**62), 2**62, n).astype(np.int64))
    vals32 = jnp.asarray(rng.integers(0, 2**31, n).astype(np.int32))
    m = n // 2
    rrow = jnp.asarray(rng.integers(0, m + 1, n).astype(np.int32))

    t("scatter-add i64 [n]<-seg_id", jax.jit(
        lambda v, s: jnp.zeros(n, jnp.int64).at[s].add(v)), vals64, seg_id)
    t("scatter-set i32 [m+1]<-rrow drop", jax.jit(
        lambda v, r: jnp.zeros(m + 1, jnp.int32).at[r].set(v, mode="drop")),
      vals32, rrow)
    t("gather i64 [n] sorted idx", jax.jit(lambda v, i: v[i]), vals64, idx_sorted)
    t("gather i64 [n] random idx", jax.jit(lambda v, i: v[i]), vals64, idx_dup)
    t("gather i32 [n] seg_id (sorted)", jax.jit(lambda v, i: v[i]), vals32, seg_id)
    t("cumsum i64 [n]", jax.jit(jnp.cumsum), vals64)
    t("cumsum i32 [n]", jax.jit(jnp.cumsum), vals32)
    t("cummax i32 [n]", jax.jit(lambda v: jax.lax.cummax(v)), vals32)
    t("elementwise mix64-ish [n]", jax.jit(
        lambda v: (v * np.int64(-7046029254386353131)) ^ ((v >> 30) & jnp.int64(0x3FFFFFFFF))), vals64)
    t("sort 3xi32 (ref)", jax.jit(
        lambda a, b: jax.lax.sort((a, b, b), num_keys=3)), vals32, vals32)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3 * (1 << 22))

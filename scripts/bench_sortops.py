"""Measure hand-rolled bitonic_sort vs jax.lax.sort on the TPU at K2 scale.

Usage: python scripts/bench_sortops.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mauvealigner_tpu.ops import sortops


def main(n: int, iters: int):
    rng = np.random.default_rng(37)
    hi = rng.integers(0, 1 << 13, n).astype(np.int32)
    lo = rng.integers(0, 1 << 31, n).astype(np.int32)
    packed = rng.permutation(n).astype(np.int32)  # unique -> unique tuples
    dev = [jnp.asarray(x) for x in (hi, lo, packed)]

    @jax.jit
    def lax3(h, l, p):
        return jax.lax.sort((h, l, p), num_keys=3)

    @jax.jit
    def bit3(h, l, p):
        return sortops.bitonic_sort((h, l, p), num_keys=3)

    def sync(out):
        # block_until_ready does not synchronize on the axon backend; a
        # 1-element download is the reliable fence (~10-30ms tunnel trip)
        return float(np.asarray(out[0][-1]))

    for name, fn in (("lax.sort", lax3), ("bitonic", bit3)):
        t0 = time.time()
        sync(fn(*dev))
        cold = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            sync(fn(*dev))
            times.append(time.time() - t0)
        print(f"{name:10s} n={n}: cold {cold:.2f}s warm {min(times):.3f}s "
              f"(all {[round(t, 3) for t in times]})", flush=True)
    a = [np.asarray(x) for x in lax3(*dev)]
    b = [np.asarray(x) for x in bit3(*dev)]
    same = all((x == y).all() for x, y in zip(a, b))
    print("outputs identical:", same, flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3 * (1 << 22)
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(n, iters)

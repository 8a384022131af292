"""A/B the paired-diagonal Pallas Gotoh body (unroll=2) vs the baseline
kernel on the REAL TPU at production batch sizes.

Round-4 designed attempt at the ~370 ns/diagonal serial-chain bound
(BENCH_NOTES "K3 speed-of-light accounting"); PRE-REGISTERED criterion:
accept (flip the default) only if on-chip GCUPS at bucket 512 improves
>1.5x, else revert and close the investigation with the measurement.

Usage: python scripts/bench_k3_unroll.py [buckets...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def production_batch(M: int, budget: int = 3 << 29) -> int:
    per_elt = (2 * M + 1) * (M + 1) + 12 * M * M
    return max(1, min(4096, budget // per_elt))


def measure(M: int) -> dict:
    import jax
    import jax.numpy as jnp

    from mauvealigner_tpu.ops.dp import HOXD70
    from mauvealigner_tpu.ops.dp_pallas import gotoh_forward_pallas

    B = production_batch(M)
    rng = np.random.default_rng(37)
    ca = rng.integers(0, 4, (B, M)).astype(np.uint8)
    cb = ca.copy()
    mut = rng.random((B, M)) < 0.1
    cb[mut] = rng.integers(0, 4, int(mut.sum()))
    la = rng.integers(M // 2, M + 1, B).astype(np.int32)
    lb = rng.integers(M // 2, M + 1, B).astype(np.int32)

    dca, dcb = jnp.asarray(ca), jnp.asarray(cb)
    dla, dlb = jnp.asarray(la), jnp.asarray(lb)
    sym = jnp.arange(5, dtype=jnp.uint8)
    pa = (dca[:, :, None] == sym[None, None, :]).astype(jnp.float32)
    pb = (dcb[:, :, None] == sym[None, None, :]).astype(jnp.float32)
    subst = jnp.asarray(HOXD70, jnp.float32)
    go, ge = jnp.float32(-400.0), jnp.float32(-30.0)

    outs = {}
    rec = {"bucket": M, "batch": B}
    for unroll in (1, 2):
        def fwd():
            return gotoh_forward_pallas(
                pa, pb, dla, dlb, subst, go, ge, M, M, unroll=unroll
            )

        t0 = time.time()
        s, dec = fwd()
        # axon sync fence: 1-element download of a device-side slice
        float(np.asarray(s[-1]))
        rec[f"cold_s_u{unroll}"] = round(time.time() - t0, 3)
        outs[unroll] = (s, dec)

        LOOPS = 32

        @jax.jit
        def fwd_loop():
            def body(i, acc):
                s2, _ = gotoh_forward_pallas(
                    pa, pb, dla + (acc * 0).astype(jnp.int32), dlb,
                    subst, go, ge, M, M, unroll=unroll,
                )
                return acc + jnp.sum(s2) * jnp.float32(1e-9)

            return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0.0))

        out = fwd_loop()
        float(np.asarray(out))  # warm + fence
        t0 = time.time()
        out = fwd_loop()
        float(np.asarray(out))
        chip_s = max((time.time() - t0) / LOOPS, 1e-9)
        rec[f"chip_forward_s_u{unroll}"] = round(chip_s, 5)
        rec[f"gcups_chip_u{unroll}"] = round(B * M * M / chip_s / 1e9, 2)
    s1, d1 = outs[1]
    s2, d2 = outs[2]
    rec["identical"] = bool(
        np.array_equal(np.asarray(s1), np.asarray(s2))
        and np.array_equal(np.asarray(d1), np.asarray(d2))
    )
    rec["speedup"] = round(
        rec["gcups_chip_u2"] / max(rec["gcups_chip_u1"], 1e-9), 3
    )
    return rec


if __name__ == "__main__":
    buckets = [int(a) for a in sys.argv[1:]] or [512, 1024]
    for M in buckets:
        print(json.dumps(measure(M)), flush=True)

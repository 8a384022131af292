"""Compile + equivalence check of the Pallas Gotoh kernel on the REAL TPU
backend at every production closure bucket and its production batch size.

Interpret-mode tests catch none of the Mosaic legalization issues
(CLAUDE.md), so every bucket must compile and match the scan path
byte-for-byte on the real chip before the kernel is trusted there.

Usage: python scripts/compile_check_pallas.py [buckets...]
Emits one JSON line per bucket with warm timings for both paths.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def production_batch(M: int, budget: int = 3 << 29) -> int:
    # keep in sync with dp.align_sequence_pairs' peak-honest estimate
    per_elt = (2 * M + 1) * (M + 1) + 12 * M * M
    return max(1, min(4096, budget // per_elt))


def check_bucket(M: int) -> dict:
    from mauvealigner_tpu.ops import dp

    B = production_batch(M)
    rng = np.random.default_rng(37)
    ca = rng.integers(0, 4, (B, M)).astype(np.uint8)
    cb = ca.copy()
    mut = rng.random((B, M)) < 0.1
    cb[mut] = rng.integers(0, 4, int(mut.sum()))
    la = rng.integers(M // 2, M + 1, B).astype(np.int32)
    lb = rng.integers(M // 2, M + 1, B).astype(np.int32)
    ca[np.arange(M)[None, :] >= la[:, None]] = 255
    cb[np.arange(M)[None, :] >= lb[:, None]] = 255

    def run(no_pallas: bool):
        if no_pallas:
            os.environ["MAUVE_NO_PALLAS"] = "1"
        else:
            os.environ.pop("MAUVE_NO_PALLAS", None)
        t0 = time.time()
        ops1, s1 = dp.align_code_pairs_batch(ca, cb, la, lb)
        cold = time.time() - t0
        t0 = time.time()
        ops2, s2 = dp.align_code_pairs_batch(ca, cb, la, lb)
        warm = time.time() - t0
        return ops2, s2, cold, warm

    ops_scan, s_scan, cold_scan, warm_scan = run(no_pallas=True)
    ops_pal, s_pal, cold_pal, warm_pal = run(no_pallas=False)
    identical = all(
        np.array_equal(a, b) for a, b in zip(ops_scan, ops_pal)
    ) and np.allclose(s_scan, s_pal, atol=1e-2)

    # kernel-only forward GCUPS: inputs device-resident, no traceback, no
    # transfers — the number to hold against the wavefront roofline
    # (end-to-end timings above include host round trips over the tunnel)
    import jax
    import jax.numpy as jnp

    from mauvealigner_tpu.ops.dp import HOXD70, _gotoh_codes_pallas

    dca, dcb = jnp.asarray(ca), jnp.asarray(cb)
    dla, dlb = jnp.asarray(la), jnp.asarray(lb)
    subst = jnp.asarray(HOXD70, jnp.float32)
    go, ge = jnp.float32(-400.0), jnp.float32(-30.0)

    def fwd():
        return _gotoh_codes_pallas(dca, dcb, dla, dlb, subst, go, ge, M, M)

    jax.block_until_ready(fwd())
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = fwd()
    jax.block_until_ready(out)
    kernel_s = (time.time() - t0) / reps

    # per-dispatch tunnel latency dominates single launches (~30-45 ms vs
    # sub-ms of chip time at these batch sizes), so the TRUE chip throughput
    # comes from an on-device loop: LOOPS forwards inside ONE dispatch,
    # dependence threaded through the scores so XLA cannot elide iterations
    LOOPS = 32

    @jax.jit
    def fwd_loop():
        def body(i, acc):
            s, dec = _gotoh_codes_pallas(
                dca, dcb, dla + (acc * 0).astype(jnp.int32), dlb,
                subst, go, ge, M, M,
            )
            return acc + jnp.sum(s) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0.0))

    jax.block_until_ready(fwd_loop())
    t0 = time.time()
    jax.block_until_ready(fwd_loop())
    loop_s = time.time() - t0
    chip_s = max(loop_s / LOOPS, 1e-9)
    return {
        "bucket": M,
        "batch": B,
        "identical": bool(identical),
        "scan_warm_s": round(warm_scan, 3),
        "pallas_warm_s": round(warm_pal, 3),
        "scan_cold_s": round(cold_scan, 3),
        "pallas_cold_s": round(cold_pal, 3),
        "gcups_e2e": round(B * M * M / max(warm_pal, 1e-9) / 1e9, 2),
        "kernel_forward_s": round(kernel_s, 4),
        "gcups_kernel": round(B * M * M / max(kernel_s, 1e-9) / 1e9, 2),
        "chip_forward_s": round(chip_s, 5),
        "gcups_chip": round(B * M * M / chip_s / 1e9, 2),
        "chip_utilization_vs_270_roofline": round(
            B * M * M / chip_s / 270e9, 4
        ),
    }


if __name__ == "__main__":
    buckets = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 4096]
    for M in buckets:
        print(json.dumps(check_bucket(M)), flush=True)

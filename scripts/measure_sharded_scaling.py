"""Relative work-scaling of the sharded N-way anchor search.

Runs the flagship candidate search single-device and under 2/4/8-device
CPU meshes on a 1 Mbp pair, reporting per-device sort-entry counts (the
work measure that is meaningful on virtual devices — wall-clock on a
CPU-emulated mesh is not) plus wall-clock for reference.

Per-device entries for the sharded path = N/D (phase-1 local dispatch)
+ D*C1 (phase-1 receive = grouping sort) + D*C2 (phase-2 receive =
run-merge sort); the single-device path sorts N (grouping) + N/2
(rep compaction).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(size=1_000_000):
    from mauvealigner_tpu.core.sml import build_mer_list_device
    from mauvealigner_tpu.ops import matchops
    from mauvealigner_tpu.parallel import find_multi_mums_sharded, make_mesh
    from mauvealigner_tpu.seeds import get_seed
    from mauvealigner_tpu.utils import simulate, timing

    rng = np.random.default_rng(37)
    anc = simulate.random_genome(rng, size)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.0005, del_rate=0.0005)
    genomes = [anc, der]
    seed = get_seed(15, 0)
    smls = [build_mer_list_device(g, seed) for g in genomes]
    keys, _, _ = matchops._concat_device_smls(smls)
    N = int(keys.shape[0])

    t0 = time.time()
    single = matchops.find_multi_mums_device(genomes, smls, seed_length=seed.length)
    t_single = time.time() - t0
    single_work = N + N // 2
    print(json.dumps({
        "mode": "single", "entries_sorted_per_device": single_work,
        "wallclock_s": round(t_single, 2), "n_matches": len(single),
    }), flush=True)

    for D in (2, 4, 8):
        mesh = make_mesh(D)
        timing.GLOBAL.counters.pop("k2_sharded_entries_per_device", None)
        t0 = time.time()
        sharded = find_multi_mums_sharded(genomes, smls, mesh, seed_length=seed.length)
        t_sh = time.time() - t0
        per_dev = timing.GLOBAL.counters.get("k2_sharded_entries_per_device", 0)
        print(json.dumps({
            "mode": f"sharded_D{D}",
            "entries_sorted_per_device": int(per_dev),
            "work_vs_single": round(per_dev / single_work, 3),
            "wallclock_s": round(t_sh, 2),
            "n_matches": len(sharded),
            "matches_equal_single": bool(
                len(sharded) == len(single)
            ),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

"""Multi-process (DCN analog) execution of the sharded anchor search:
two OS processes, 4 virtual devices each, collectives across the process
boundary — the mpiMauveAligner replacement, tested for exact equivalence
with the single-device search."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_two_process_anchor_search_matches_single_device(tmp_path, rng):
    worker = pathlib.Path(__file__).parent / "multihost_worker.py"
    out = tmp_path / "result.npz"
    port = str(12400 + os.getpid() % 1000)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), "2", port, str(out)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    got = np.load(out)

    # single-device reference on the identical genomes
    from mauvealigner_tpu.core.sml import build_mer_list_device
    from mauvealigner_tpu.ops import matchops
    from mauvealigner_tpu.seeds import get_seed
    from mauvealigner_tpu.utils import simulate

    r = np.random.default_rng(37)
    anc = simulate.random_genome(r, 4000)
    der, _ = simulate.evolve(anc, r, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
    seed = get_seed(9, 0)
    smls = [build_mer_list_device(g, seed) for g in (anc, der)]
    single = matchops.find_multi_mums_device(
        [anc, der], smls, seed_length=seed.length
    )
    canon = lambda s, l: set(
        map(tuple, np.concatenate([s, l[:, None]], axis=1).tolist())
    )
    assert canon(got["starts"], got["lengths"]) == canon(
        single.starts, single.lengths
    )

"""Worker for test_multihost.py: one process of a 2-process CPU 'pod'.

Runs the sharded N-way anchor search over the GLOBAL mesh (4 virtual
devices per process, collectives across processes via Gloo) and writes the
result from process 0.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mauvealigner_tpu.parallel import multihost

multihost.init_multihost(f"localhost:{port}", nproc, pid)
assert jax.device_count() == 4 * nproc

from mauvealigner_tpu.parallel.sharded import find_multi_mums_sharded

from mauvealigner_tpu.core.sml import build_mer_list_device
from mauvealigner_tpu.seeds import get_seed
from mauvealigner_tpu.utils import simulate

rng = np.random.default_rng(37)
anc = simulate.random_genome(rng, 4000)
der, _ = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
genomes = [anc, der]
seed = get_seed(9, 0)
smls = [build_mer_list_device(g, seed) for g in genomes]
mesh = multihost.global_mesh()
ml = find_multi_mums_sharded(genomes, smls, mesh, seed_length=seed.length)
if pid == 0:
    np.savez(out_path, starts=ml.starts, lengths=ml.lengths)
print(f"proc {pid}: {len(ml)} matches", flush=True)

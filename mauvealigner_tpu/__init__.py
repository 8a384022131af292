"""mauvealigner_tpu: a TPU-native whole-genome multiple alignment framework.

A ground-up redesign of the Mauve genome-alignment system (reference:
koadman/mauveAligner v1.2.1 + its libMems/libGenome/libMUSCLE core) for TPU
hardware.  Compute-heavy phases (spaced-mer sorting, multi-MUM enumeration,
gapped affine DP, homology-HMM scans) run on device via JAX/XLA/Pallas;
orchestration, combinatorial LCB logic, trees and serialization run on host.

Layer map (mirrors SURVEY.md §1):
  L0 genome/    sequence model + FASTA/GenBank/raw I/O
  L1 seeds.py   spaced-seed registry;  core/sml.py sorted mer lists
  L2 ops/matchops.py  multi-MUM enumeration
  L3 core/      match / interval / gapped-alignment data model, XMFA
  L4 ops/dp.py  banded affine-gap DP (replaces libMUSCLE subprocess)
  L5 models/    Aligner / ProgressiveAligner / Repeatoire pipelines
  L6 analysis/  islands, backbone HMM, scoring, distance matrices
  L7 tools/     command-line applications
  L8 analysis/tree.py  phylogenetic utilities
"""

import os

import jax

# Genome coordinates and packed spaced-seed mers need 64-bit integers
# (seed weight w -> 2w+1 key bits; w can exceed 15).  Enable x64 before any
# array is created.  TPU emulates s64 with s32 pairs; the hot sort paths
# split keys into 32-bit halves where it matters (ops/merops.py).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline compiles a bounded family of
# bucketed kernel shapes; caching them across processes keeps driver/bench
# startup fast (first compile on the TPU tunnel is expensive).
try:
    # Persist compiled executables ONLY for the TPU tunnel platform, where a
    # fresh compile costs minutes via the remote compile service.  CPU
    # compiles are fast locally, and cached CPU artifacts may have been
    # produced on the remote service's different host CPU (machine-feature
    # mismatch -> SIGILL risk), so CPU runs skip the cache entirely.
    _platform = str(jax.config.jax_platforms or "default").split(",")[0] or "default"
    if _platform not in ("cpu",):
        _cache_dir = os.environ.get(
            "MAUVE_TPU_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", f".jax_cache_{_platform}"),
        )
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.1.0"

DEFAULT_RANDOM_SEED = 37  # reference: SetTwisterSeed(37), progressiveMauve.cpp:355

"""Distribution layer: mesh construction + sharded kernels.

TPU-native replacement for the reference's distribution mechanisms (SURVEY.md
§2 parallelism checklist): the file-based map-reduce over seed space
(--match-log/--offset-log/--merge-match-log, src/mauveAligner.cpp:533-589),
the per-LCB task split (--realign-lcb, src/mauveAligner.cpp:723-744) and the
missing MPI variant are all subsumed by SPMD sharding over a device mesh:

  * K1/K2: genome replicated, *seed space* sharded — each device packs and
    sorts its block of window positions; match enumeration merges shards
    with collectives instead of journal files;
  * K3: inter-anchor DP tiles are batch-sharded across devices (the TPU
    analog of --realign-lcb task parallelism).
"""

from mauvealigner_tpu.parallel.sharded import (
    find_multi_mums_sharded,
    find_pair_mums_sharded,
    make_mesh,
    sharded_gotoh_scores,
    sharded_hmm_posteriors,
    sharded_pack_sort,
    sharded_mum_candidate_tables,
    sharded_pair_mum_tables,
    sort_contigs_sharded,
    multichip_pipeline_step,
)

__all__ = [
    "find_multi_mums_sharded",
    "find_pair_mums_sharded",
    "sharded_mum_candidate_tables",
    "sort_contigs_sharded",
    "make_mesh",
    "sharded_pack_sort",
    "sharded_gotoh_scores",
    "sharded_hmm_posteriors",
    "sharded_pair_mum_tables",
    "multichip_pipeline_step",
]

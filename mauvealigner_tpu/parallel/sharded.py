"""Sharded device kernels over a jax.sharding.Mesh.

Strategy (SURVEY.md §5.8 / §7 step 8): genomes are replicated per host;
the *work* is sharded —

  * `sharded_pack_sort`: the seed/window space of a genome is split into
    contiguous blocks (with a pattern-length halo); each device packs and
    locally sorts its block; the shards are then merged by a final
    all-gathered sort.  This is the distributed SML build.
  * `sharded_gotoh_scores`: a batch of DP problems sharded over the batch
    dimension (data parallelism over inter-anchor regions / LCBs).
  * `multichip_pipeline_step`: one full anchoring+DP step under a single
    jit over the mesh — the driver's multi-chip dry-run target.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mauvealigner_tpu.ops import dp as dp_ops
from mauvealigner_tpu.ops import merops

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (AXIS,))


def sharded_pack_sort(
    codes: jnp.ndarray, offsets: Tuple[int, ...], pattern_len: int, mesh: Mesh
):
    """Distributed SML build: block-shard the window space.

    codes: int32[Ppad] (replicated; Ppad - pattern_len + 1 window positions,
    padded so the position count divides the mesh).  Returns globally sorted
    (keys int64[n_pos], positions int32[n_pos]).
    """
    n_dev = mesh.devices.size
    n_pos = codes.shape[0] - pattern_len + 1
    block = -(-n_pos // n_dev)  # ceil
    halo = pattern_len - 1

    def local(codes_rep):
        d = jax.lax.axis_index(AXIS)
        start = d * block
        # each device packs windows [start, start+block) using codes with halo
        chunk = jax.lax.dynamic_slice(codes_rep, (start,), (block + halo,))
        keys = merops.pack_canonical_mers(chunk, offsets, pattern_len)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0).reshape(block)
        # windows past the true end were packed from pad codes -> INVALID
        keys_s, pos_s = merops.sort_key_pos(keys, pos)
        return keys_s[None], pos_s[None]

    # pad codes so every device's dynamic_slice is in range
    need = block * n_dev + halo
    if codes.shape[0] < need:
        codes = jnp.concatenate(
            [codes, jnp.full(need - codes.shape[0], 4, codes.dtype)]
        )
    keys_sh, pos_sh = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(),
        out_specs=P(AXIS),
        check_vma=False,
    )(codes)
    # final merge: global sort of the gathered shards (replicated result)
    keys_flat = keys_sh.reshape(-1)
    pos_flat = pos_sh.reshape(-1)
    return merops.sort_key_pos(keys_flat, pos_flat)


def sharded_gotoh_scores(
    pa: jnp.ndarray,  # [B, M, 5] profiles
    pb: jnp.ndarray,  # [B, N, 5]
    lens_a: jnp.ndarray,
    lens_b: jnp.ndarray,
    mesh: Mesh,
    subst: Optional[jnp.ndarray] = None,
    gap_open: float = dp_ops.DEFAULT_GAP_OPEN,
    gap_extend: float = dp_ops.DEFAULT_GAP_EXTEND,
):
    """Batch-sharded Gotoh forward scores (B must divide by mesh size)."""
    if subst is None:
        subst = jnp.asarray(dp_ops.HOXD70)
    M, N = pa.shape[1], pb.shape[1]

    def local(pa_l, pb_l, la_l, lb_l):
        H_all, _ = dp_ops.gotoh_forward(
            pa_l, pb_l, subst, jnp.float32(gap_open), jnp.float32(gap_extend), M, N
        )
        b = pa_l.shape[0]
        bi = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
        return H_all[bi, la_l + lb_l, la_l]

    spec = P(AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(pa, pb, lens_a, lens_b)


def sharded_hmm_posteriors(
    log_emit: jnp.ndarray,   # [B, T, S] (B must divide by mesh size)
    log_trans: jnp.ndarray,  # [S, S] (replicated)
    log_init: jnp.ndarray,   # [S] (replicated)
    lengths: jnp.ndarray,    # [B]
    mesh: Mesh,
) -> jnp.ndarray:
    """Batch-sharded K4 forward/backward: each device decodes its slice of
    the pairwise-projection batch with the log-depth associative scan
    (homology backbone phase, data-parallel over alignment pairs)."""
    from mauvealigner_tpu.ops import hmm as hmm_ops

    def local(le, lens):
        return hmm_ops.forward_backward(le, log_trans, log_init, lens)

    spec = P(AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )(log_emit, lengths)


def sharded_pair_mum_tables(
    keys: jnp.ndarray,     # int64 [D, N] per-pair concatenated SML keys
    seq_ids: jnp.ndarray,  # int32 [D, N]
    pos: jnp.ndarray,      # int32 [D, N]
    n_seqs: int,
    cap: int,
    mesh: Mesh,
    min_multi: int = 2,
):
    """K2 unique-MUM candidate search for many independent genome pairs,
    sharded over the pair axis (D must divide by the mesh size).

    This is the pod-level axis of the draft workflow (BASELINE config 5,
    reference analog: per-process match partitioning via --match-log /
    --realign-lcb, src/mauveAligner.cpp:130-131,533-589): each device runs
    the full candidate kernel on its local reference-vs-draft pairs; the
    packed tables come back sharded and decode independently on host.
    """
    from mauvealigner_tpu.ops import matchops

    mask = jnp.ones(n_seqs, jnp.int32)

    def local(k, s, p):
        f = lambda kk, ss, pp: matchops.device_mum_candidates(
            kk, ss, pp, mask, n_seqs, cap, min_multi
        )
        return jax.vmap(f)(k, s, p)

    spec = P(AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(keys, seq_ids, pos)


def find_pair_mums_sharded(
    ref,
    drafts,
    seed,
    mesh: Mesh,
    extend: bool = True,
):
    """Reference-vs-draft unique MUMs for every draft, pair-sharded over the
    mesh.  Returns one 2-sequence MatchList per draft (row 0 = ref).

    Host driver for the config-5 pod story: per-pair SMLs build on device,
    pairs pad to the mesh size (empty pads decode to empty lists), ONE
    sharded kernel launch covers every pair, and each table decodes with the
    same host decode as the single-chip path.
    """
    from mauvealigner_tpu.core.sml import build_mer_list_device
    from mauvealigner_tpu.ops import matchops

    n_dev = mesh.devices.size
    D = len(drafts)
    if D == 0:
        return []
    ref_sml = build_mer_list_device(ref, seed)
    cols = [
        matchops._concat_device_smls([ref_sml, build_mer_list_device(d, seed)])
        for d in drafts
    ]
    # pairs may land in different length buckets; group launches by bucket
    out: list = [None] * D
    by_n: dict = {}
    for i, (k, _, _) in enumerate(cols):
        by_n.setdefault(int(k.shape[0]), []).append(i)
    for N, idxs in by_n.items():
        # pad this bucket's pair count to the mesh size (pad rows repeat a
        # real pair; their rows are simply not decoded)
        padded = list(idxs)
        while len(padded) % n_dev:
            padded.append(idxs[0])
        K = jnp.stack([cols[i][0] for i in padded])
        S = jnp.stack([cols[i][1] for i in padded])
        Ppos = jnp.stack([cols[i][2] for i in padded])
        cap = max(1 << 14, N >> 3)
        tabs = np.asarray(sharded_pair_mum_tables(K, S, Ppos, 2, cap, mesh))
        for row, i in enumerate(idxs):
            ml = matchops.decode_mum_table(tabs[row], 2, cap, seed.length)
            if extend and len(ml):
                ml = matchops.extend_matches_maximal(
                    ml, [ref.codes, drafts[i].codes]
                )
            out[i] = ml
    return out


def sort_contigs_sharded(
    ref,
    drafts,
    mesh: Mesh,
    seed_weight: Optional[int] = None,
):
    """Pod-level draft workflow front half (BASELINE config 5): the per-draft
    reference-vs-draft MUM searches shard over the mesh; LCB determination,
    placement walk and contig reordering stay on host per draft.

    Returns [(reordered genome, placement log)] per draft — exactly what the
    sequential sortContigs flow produces (tools/manipulate.sort_contigs).
    """
    from mauvealigner_tpu.models.lcb import greedy_breakpoint_elimination
    from mauvealigner_tpu.seeds import default_mer_size, get_seed
    from mauvealigner_tpu.tools.manipulate import (
        contig_placements_from_lcbs,
        sort_contigs,
    )

    if not drafts:
        return []
    # the sequential flow picks the default seed per (ref, draft) pair
    # (MauveAligner.find_mums averages the PAIR's lengths); group drafts by
    # that weight so every pair searches with the same seed it would get
    # sequentially
    by_weight: dict = {}
    for i, d in enumerate(drafts):
        w = seed_weight or default_mer_size(int(np.mean([len(ref), len(d)])))
        by_weight.setdefault(w, []).append(i)
    out: list = [None] * len(drafts)
    for weight, idxs in by_weight.items():
        seed = get_seed(weight, 0)
        mls = find_pair_mums_sharded(ref, [drafts[i] for i in idxs], seed, mesh)
        for i, ml in zip(idxs, mls):
            d = drafts[i]
            # mirror MauveAligner.determine_lcbs with default options:
            # n-way filter, overlap elimination, re-filter, then greedy
            # breakpoint elimination at seed_weight*3*n_seqs
            ml = ml.multiplicity_filter(2)
            ml = ml.eliminate_overlaps().multiplicity_filter(2)
            _, lcbs = greedy_breakpoint_elimination(ml, float(weight * 3 * 2))
            placements = contig_placements_from_lcbs(d, lcbs, draft_seq_index=1)
            out[i] = sort_contigs(d, placements)
    return out


def multichip_pipeline_step(
    mesh: Mesh,
    codes_a: jnp.ndarray,
    codes_b: jnp.ndarray,
    offsets: Tuple[int, ...],
    pattern_len: int,
    dp_pa: jnp.ndarray,
    dp_pb: jnp.ndarray,
    dp_la: jnp.ndarray,
    dp_lb: jnp.ndarray,
):
    """One full sharded anchoring + DP + HMM step (jit target for the dry
    run).

    Returns (sml_a keys, sml_b keys, shared-mer count, dp scores,
    per-element homology posterior means).
    """
    ka, _ = sharded_pack_sort(codes_a, offsets, pattern_len, mesh)
    kb, _ = sharded_pack_sort(codes_b, offsets, pattern_len, mesh)
    # device-side shared-mer statistic (anchoring proxy): count of mers of A
    # present in B via searchsorted on the sorted lists
    mer_a = ka >> 1
    mer_b = kb >> 1
    idx = jnp.searchsorted(mer_b, mer_a)
    idx = jnp.clip(idx, 0, mer_b.shape[0] - 1)
    shared = jnp.sum((mer_b[idx] == mer_a) & (ka != merops.INVALID_KEY))
    scores = sharded_gotoh_scores(dp_pa, dp_pb, dp_la, dp_lb, mesh)
    # K4 slice: batch-sharded homology posterior decode on tiny shapes;
    # positive DP scores emit in favor of state 0 ("homologous")
    B = dp_pa.shape[0]
    hi = jnp.where(scores[:, None] > jnp.float32(0.0), -0.1, -2.0)
    lo = jnp.where(scores[:, None] > jnp.float32(0.0), -2.0, -0.1)
    le = jnp.stack(
        [jnp.broadcast_to(hi, (B, 8)), jnp.broadcast_to(lo, (B, 8))], axis=-1
    ).astype(jnp.float32)
    post = sharded_hmm_posteriors(
        le,
        jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], jnp.float32)),
        jnp.log(jnp.asarray([0.5, 0.5], jnp.float32)),
        jnp.full((B,), 8, jnp.int32),
        mesh,
    )
    return ka, kb, shared, scores, post[:, :, 0].mean(axis=1)

"""The batched multi-gap search (one device program for every recursion gap)
must reproduce the per-gap searches exactly: same matches, same genome
coordinates, per-gap uniqueness semantics."""

import numpy as np

from mauvealigner_tpu.core.sml import build_mer_list_device
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.ops import matchops
from mauvealigner_tpu.seeds import get_seed
from mauvealigner_tpu.utils import simulate


def _extract(genome, left, right, strand):
    if right < left:
        return np.zeros(0, np.int64)
    return genome.sub_codes_signed(strand * left, right - left + 1).astype(np.int64)


def _per_gap_reference(genomes, gap_specs, seed):
    """The pre-batching semantics: one find_multi_mums_device per gap,
    mapped back to genome coordinates with the original formulas."""
    n = len(genomes)
    out = set()
    for g in range(gap_specs.shape[0]):
        specs = [tuple(int(v) for v in gap_specs[g, s]) for s in range(n)]
        regions = [
            Genome.from_codes(_extract(genomes[s], *specs[s]), name=f"sub{s}")
            for s in range(n)
        ]
        if any(len(r) < seed.length for r in regions):
            continue
        smls_dev = [build_mer_list_device(r, seed) for r in regions]
        sub_ml = matchops.find_multi_mums_device(
            regions, smls_dev, seed_length=seed.length
        )
        for m in range(len(sub_ml)):
            row = [g]
            ok = True
            for s in range(n):
                l_s, r_s, st_s = specs[s]
                q = int(sub_ml.starts[m, s])
                ln = int(sub_ml.lengths[m])
                if q == 0:
                    row.append(0)
                    continue
                if st_s > 0:
                    glob = l_s - 1 + abs(q) if q > 0 else -(l_s - 1 + abs(q))
                else:
                    left_global = r_s - abs(q) - ln + 2
                    glob = -left_global if q > 0 else left_global
                row.append(glob)
            row.append(int(sub_ml.lengths[m]))
            out.add(tuple(row))
    return out


def _batched(genomes, gap_specs, seed):
    gap_ids, ml = matchops.find_gap_mums_batched(genomes, gap_specs, seed)
    out = set()
    for m in range(len(ml)):
        row = [int(gap_ids[m])]
        row.extend(int(v) for v in ml.starts[m])
        row.append(int(ml.lengths[m]))
        out.add(tuple(row))
    return out


def _gap_specs_from_anchor_grid(genomes, n_gaps, rng, invert_some=True):
    """Carve matching regions out of related genomes: gap i covers
    [a_i, b_i] of the ancestor and the corresponding coordinates of each
    derived genome (some reversed)."""
    n = len(genomes)
    L = min(len(g) for g in genomes)
    edges = np.linspace(100, L - 100, n_gaps + 1).astype(int)
    specs = np.zeros((n_gaps, n, 3), np.int64)
    for g in range(n_gaps):
        a, b = int(edges[g]) + 5, int(edges[g + 1]) - 5
        for s in range(n):
            strand = -1 if (invert_some and s > 0 and rng.random() < 0.4) else 1
            specs[g, s] = (a, b, strand)
    return specs


def test_batched_equals_per_gap(rng):
    anc = simulate.random_genome(rng, 12_000)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.02)
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.03)
    genomes = [anc, d1, d2]
    specs = _gap_specs_from_anchor_grid(genomes, 8, rng)
    seed = get_seed(9, 0)
    assert _batched(genomes, specs, seed) == _per_gap_reference(genomes, specs, seed)


def test_batched_per_gap_uniqueness(rng):
    """A mer repeated across two gaps (but unique within each) must still
    anchor both gaps — global grouping without gap tags would drop it."""
    core = simulate.random_genome(rng, 400)
    filler1 = simulate.random_genome(rng, 600)
    filler2 = simulate.random_genome(rng, 600)
    seq = np.concatenate([core.seq, filler1.seq, core.seq, filler2.seq])
    g1 = Genome(seq, name="g1")
    g2 = Genome(seq.copy(), name="g2")
    # gap 0 covers the first copy of `core`, gap 1 the second
    specs = np.array(
        [
            [[1, 500, 1], [1, 500, 1]],
            [[1001, 1500, 1], [1001, 1500, 1]],
        ],
        np.int64,
    )
    seed = get_seed(9, 0)
    batched = _batched([g1, g2], specs, seed)
    per_gap = _per_gap_reference([g1, g2], specs, seed)
    assert batched == per_gap
    gaps_with_matches = {row[0] for row in batched}
    assert gaps_with_matches == {0, 1}


def test_batched_empty_and_absent_components(rng):
    anc = simulate.random_genome(rng, 4000)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    specs = np.array(
        [
            [[100, 900, 1], [100, 900, 1]],
            [[2000, 2600, 1], [2000, 2600, -1]],  # reversed region
        ],
        np.int64,
    )
    seed = get_seed(9, 0)
    assert _batched([anc, der], specs, seed) == _per_gap_reference(
        [anc, der], specs, seed
    )


def test_pairwise_fast_path_matches_general(rng):
    """The pairwise closure fast path must match the general hierarchical
    machinery exactly (empty sides, over-cap, and normal gaps)."""
    from mauvealigner_tpu.models import closure

    groups = []
    for _ in range(40):
        la = int(rng.integers(0, 60))
        lb = int(rng.integers(0, 60))
        if rng.random() < 0.1:
            la = 0
        if rng.random() < 0.1:
            lb = 0
        groups.append([
            rng.integers(0, 4, la).astype(np.int8),
            rng.integers(0, 4, lb).astype(np.int8),
        ])
    groups.append([rng.integers(0, 4, 90).astype(np.int8),
                   rng.integers(0, 4, 10).astype(np.int8)])  # over cap
    fast = closure._pairwise_align_region_groups(
        groups, closure.dp.HOXD70, -400.0, -30.0, max_len=64
    )
    # general path: an extra INERT plan step (both refs absent from every
    # group's state) disables the fast-path gate without changing results
    general = closure.hierarchical_align_region_groups(
        [list(g) for g in groups], [("n1", 0, 1), ("nx", "absent", "gone")],
        closure.dp.HOXD70, -400.0, -30.0, max_len=64,
    )
    assert len(fast) == len(general)
    for f, g in zip(fast, general):
        assert np.array_equal(f, g)

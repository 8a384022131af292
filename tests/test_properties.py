"""Property tests for the SURVEY §4 invariants: MUM maximality, unique-mode
uniqueness, HMM posterior normalization, LCB-weight monotonicity."""

import numpy as np
import pytest

from mauvealigner_tpu.core.match import NO_MATCH
from mauvealigner_tpu.core.sml import build_sml
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.lcb import (
    compute_lcb_boundaries,
    greedy_breakpoint_elimination,
)
from mauvealigner_tpu.ops import matchops
from mauvealigner_tpu.seeds import get_seed
from mauvealigner_tpu.utils import simulate


def _evolved_genomes(rng, n=3, size=6000, sub=0.02):
    anc = simulate.random_genome(rng, size)
    out = []
    for i in range(n):
        der, _ = simulate.evolve(anc, rng, sub_rate=sub, ins_rate=0.001, del_rate=0.001)
        out.append(Genome(der.seq, name=f"g{i}"))
    return out


def test_mum_maximality(rng):
    """No reported multi-MUM can be extended by one base on either side with
    every present genome still agreeing (base-level maximality)."""
    genomes = _evolved_genomes(rng, n=3)
    seed = get_seed(11, 0)
    smls = [build_sml(g, seed) for g in genomes]
    ml = matchops.find_multi_mums(genomes, smls, min_multi=2)
    assert len(ml) > 0

    def col(g, start, length, offset):
        """Base at `offset` columns beyond the match in match space
        (offset < 0 = before column 0); 255 = out of bounds."""
        s = int(start)
        fwd = s > 0
        left0 = abs(s) - 1
        idx = left0 + offset if fwd else left0 + length - 1 - offset
        if idx < 0 or idx >= len(g):
            return 255
        v = int(g.codes[idx])
        if not fwd and v < 4:
            v = 3 - v
        return v

    for i in range(len(ml)):
        starts = ml.starts[i]
        length = int(ml.lengths[i])
        present = np.nonzero(starts != NO_MATCH)[0]
        for offset in (-1, length):
            vals = [
                col(genomes[j], starts[j], length, offset) for j in present
            ]
            # maximality: some genome out of bounds, ambiguous, or mismatch
            ok = all(v < 4 for v in vals) and len(set(vals)) == 1
            assert not ok, (i, offset, starts, length, vals)


def test_unique_mode_seeds_unique_per_genome(rng):
    """Every match reported by the unique finder anchors on a seed window
    whose masked mer occurs exactly once in each participating genome."""
    # plant an exact duplication inside genome 0: its seeds are non-unique
    anc = simulate.random_genome(rng, 4000)
    dup = np.concatenate([anc.seq, anc.seq[1000:1500], anc.seq[3500:]])
    g0 = Genome(dup, name="g0")
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.0, del_rate=0.0)
    g1 = Genome(der.seq, name="g1")
    seed = get_seed(11, 0)
    smls = [build_sml(g, seed) for g in (g0, g1)]
    ml = matchops.find_multi_mums([g0, g1], smls, min_multi=2)
    assert len(ml) > 0
    # the duplicated block [1000,1500) of g0 must not anchor any match at
    # full length: its interior seeds occur twice in g0
    for i in range(len(ml)):
        s0 = int(ml.starts[i][0])
        if s0 == NO_MATCH:
            continue
        l, r = abs(s0), abs(s0) + int(ml.lengths[i]) - 1
        inner_l, inner_r = 1001 + seed.length, 1500 - seed.length
        assert not (l <= inner_l and r >= inner_r), (
            "match spans the duplicated block; its seeds are not unique",
            l, r, int(ml.lengths[i]),
        )


def test_hmm_posteriors_sum_to_one(rng):
    import jax.numpy as jnp

    from mauvealigner_tpu.ops import hmm

    B, T = 4, 37
    raw = rng.random((B, T, 2)) * 0.9 + 0.05
    log_emit = np.log(raw / raw.sum(axis=2, keepdims=True))
    log_trans = np.log(np.array([[0.99, 0.01], [0.02, 0.98]]))
    log_init = np.log(np.array([0.3, 0.7]))
    lengths = np.array([T, T - 5, 1, T - 1], np.int32)
    post = np.asarray(
        hmm.forward_backward(
            jnp.asarray(log_emit),
            jnp.asarray(log_trans),
            jnp.asarray(log_init),
            jnp.asarray(lengths),
        )
    )
    for b, L in enumerate(lengths):
        sums = post[b, :L].sum(axis=1)
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_lcb_count_monotone_in_min_weight(rng):
    """Raising the minimum LCB weight never increases the number of
    surviving LCBs, and total surviving weight is non-increasing."""
    genomes = _evolved_genomes(rng, n=2, size=8000)
    # shuffle genome 1 into 4 rearranged segments (one inverted)
    c = genomes[1].codes.copy()
    seg = len(c) // 4
    parts = [c[2 * seg : 3 * seg], c[:seg], (3 - c[seg : 2 * seg])[::-1], c[3 * seg :]]
    genomes[1] = Genome.from_codes(np.concatenate(parts), name="g1r")
    seed = get_seed(11, 0)
    smls = [build_sml(g, seed) for g in genomes]
    ml = matchops.find_multi_mums(genomes, smls, min_multi=2)
    assert len(ml) >= 4
    prev_n = None
    prev_total = None
    for min_w in (0, 50, 200, 800, 3200):
        kept, lcbs = greedy_breakpoint_elimination(ml, float(min_w))
        n = len(lcbs)
        total = sum(l.weight for l in lcbs)
        if prev_n is not None:
            assert n <= prev_n, (min_w, n, prev_n)
            assert total <= prev_total + 1e-9, (min_w, total, prev_total)
        for l in lcbs:
            assert l.weight >= min_w or min_w == 0
        prev_n, prev_total = n, total

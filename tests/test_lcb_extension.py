import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.utils import simulate


def test_extension_recovers_divergent_gap(rng):
    """A highly divergent middle region breaks anchoring with the big seed;
    LCB extension re-anchors it with a lighter seed."""
    anc = simulate.random_genome(rng, 6000)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.01)
    # make the middle third highly divergent (but alignable)
    mid_anc = anc.seq[2000:4000]
    mid_der, _ = simulate.evolve(Genome(mid_anc.copy()), rng, sub_rate=0.12)
    der2 = Genome(
        np.concatenate([der.seq[:2000], mid_der.seq, der.seq[4000:]]), name="d"
    )

    no_ext = MauveAligner(
        AlignerOptions(seed_size=15, use_sml_cache=False, lcb_extension=False,
                       recursive=False)
    ).align([anc, der2])
    with_ext = MauveAligner(
        AlignerOptions(seed_size=15, use_sml_cache=False, lcb_extension=True,
                       recursive=False)
    ).align([anc, der2])

    def coverage(res):
        return sum(
            int(iv.aln[0].sum())
            for iv in res.interval_list.intervals
            if iv.multiplicity() >= 2
        )

    assert coverage(with_ext) >= coverage(no_ext)
    # the extended alignment anchors some of the divergent middle
    mid_cov = 0
    for iv in with_ext.interval_list.intervals:
        if iv.multiplicity() < 2 or iv.starts[0] == 0:
            continue
        l = abs(int(iv.starts[0]))
        r = l + int(iv.aln[0].sum()) - 1
        mid_cov += max(0, min(r, 4000) - max(l, 2001) + 1)
    assert mid_cov > 500, f"middle coverage {mid_cov}"


def test_extension_noop_when_fully_covered(rng):
    anc = simulate.random_genome(rng, 2000)
    g2 = Genome(anc.seq.copy(), name="c")
    res = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False)).align([anc, g2])
    assert len(res.lcbs) == 1
    assert res.interval_list.intervals[0].n_cols == 2000

"""Draft-genome workflow integration (BASELINE config 5 shape):
shuffled multi-contig drafts -> sortContigs -> progressive alignment."""

import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.genome.sequence import Contig, Genome, revcomp_ascii
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.tools.manipulate import contig_placements_from_lcbs, sort_contigs
from mauvealigner_tpu.utils import simulate


def _make_draft(rng, genome: Genome, n_contigs: int, name: str) -> Genome:
    """Split a genome into contigs, shuffle, and invert some."""
    n = len(genome)
    cuts = np.sort(rng.choice(np.arange(500, n - 500), size=n_contigs - 1, replace=False))
    edges = np.concatenate([[0], cuts, [n]])
    pieces = []
    for i, (a, b) in enumerate(zip(edges[:-1], edges[1:])):
        chunk = genome.seq[a:b]
        if rng.random() < 0.4:
            chunk = revcomp_ascii(chunk)
        pieces.append((f"{name}_c{i}", chunk))
    order = rng.permutation(len(pieces))
    contigs = []
    parts = []
    off = 0
    for idx in order:
        cname, chunk = pieces[idx]
        contigs.append(Contig(cname, len(chunk), off))
        parts.append(chunk)
        off += len(chunk)
    return Genome(np.concatenate(parts), contigs=contigs, name=name)


def test_sort_contigs_then_align(rng):
    ref = simulate.random_genome(rng, 8000, name="ref")
    drafts = []
    for i in range(3):
        evolved, _ = simulate.evolve(ref, rng, sub_rate=0.01, ins_rate=0.0005, del_rate=0.0005)
        drafts.append(_make_draft(rng, evolved, n_contigs=4, name=f"d{i}"))

    reordered = []
    for d in drafts:
        aligner = MauveAligner(
            AlignerOptions(seed_size=11, gapped=False, recursive=False, use_sml_cache=False)
        )
        ml = aligner.find_mums([ref, d])
        _, lcbs = aligner.determine_lcbs([ref, d], ml)
        placements = contig_placements_from_lcbs(d, lcbs, draft_seq_index=1)
        fixed, log = sort_contigs(d, placements)
        reordered.append(fixed)
        assert len(log) == 4
        # most contigs placed
        assert sum(1 for _, s in log if s != 0) >= 3

    # reordered drafts now align progressively with large LCBs
    pm = ProgressiveMauve(
        ProgressiveOptions(seed_weight=11, use_sml_cache=False, skip_backbone=True)
    )
    res = pm.align([ref] + reordered)
    assert len(res.lcbs) >= 1
    # every genome's bases accounted for
    for s, g in enumerate(res.interval_list.genomes):
        total = sum(
            int(iv.aln[s].sum())
            for iv in res.interval_list.intervals
            if iv.starts[s] != 0
        )
        assert total == len(g)
    # aligned coverage of the reference is substantial
    covered = sum(
        int(iv.aln[0].sum())
        for iv in res.interval_list.intervals
        if iv.starts[0] != 0 and iv.multiplicity() >= 2
    )
    assert covered > 6000


def test_lcb_spanning_contigs_places_all(rng):
    """An LCB spanning several draft contigs places each of them in walk
    order (src/sortContigs.cpp:104-118) — the span walk, not one contig
    per LCB."""
    from mauvealigner_tpu.genome.sequence import Contig

    ref = simulate.random_genome(rng, 3000, name="ref")
    # draft contigs c0..c5 of 500 bp each, shuffled: LCBs will span runs of
    # consecutive contigs because the draft is contiguous with the reference
    seq = ref.seq.copy()
    draft = Genome(
        np.concatenate([seq[1000:3000], seq[:1000]]),
        contigs=[Contig(f"c{i}", 500, 500 * i) for i in range(6)],
        name="d",
    )
    aligner = MauveAligner(
        AlignerOptions(seed_size=11, gapped=False, recursive=False, use_sml_cache=False)
    )
    ml = aligner.find_mums([ref, draft])
    _, lcbs = aligner.determine_lcbs([ref, draft], ml)
    # 2 LCBs expected (the rotation split); each spans multiple contigs
    placements = contig_placements_from_lcbs(draft, lcbs, draft_seq_index=1)
    fixed, log = sort_contigs(draft, placements)
    placed = [name for name, s in log if s != 0]
    assert placed == ["c4", "c5", "c0", "c1", "c2", "c3"], log
    assert fixed.to_string() == ref.to_string()

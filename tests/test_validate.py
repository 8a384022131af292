import numpy as np
import pytest

from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.core.validate import (
    ConsistencyError,
    validate_interval_list,
    validate_match_list,
)
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.tools.cli import main
from mauvealigner_tpu.utils import simulate


def test_validate_match_list_good(rng):
    g = simulate.random_genome(rng, 500)
    g2 = Genome(g.seq.copy(), name="c")
    ml = MatchList(np.array([[1, 1]], np.int64), np.array([500], np.int64))
    validate_match_list(ml, [g, g2])


def test_validate_match_list_bad_bases(rng):
    a = simulate.random_genome(rng, 300)
    b = simulate.random_genome(rng, 300)
    ml = MatchList(np.array([[1, 1]], np.int64), np.array([300], np.int64))
    with pytest.raises(ConsistencyError):
        validate_match_list(ml, [a, b])


def test_validate_match_list_out_of_bounds(rng):
    g = simulate.random_genome(rng, 100)
    ml = MatchList(np.array([[50, 50]], np.int64), np.array([100], np.int64))
    with pytest.raises(ConsistencyError):
        validate_match_list(ml, [g, g], check_bases=False)


def test_validate_interval_list_double_coverage(rng):
    g = simulate.random_genome(rng, 100)
    iv1 = Interval(np.array([1, 0], np.int64), np.ones((2, 50), bool) * np.array([[True], [False]]))
    iv2 = Interval(np.array([40, 0], np.int64), np.ones((2, 30), bool) * np.array([[True], [False]]))
    ivl = IntervalList(genomes=[g, g], intervals=[iv1, iv2])
    with pytest.raises(ConsistencyError):
        validate_interval_list(ivl, [g, g])


def test_debug_mode_e2e(rng):
    anc = simulate.random_genome(rng, 1500)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    res = MauveAligner(
        AlignerOptions(seed_size=9, use_sml_cache=False, debug=True)
    ).align([anc, der])
    assert len(res.interval_list.intervals) >= 1


def test_repeats_mode_cli(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    unit = simulate.random_genome(rng, 100).seq
    g = Genome(
        np.concatenate([simulate.random_genome(rng, 150).seq, unit,
                        simulate.random_genome(rng, 150).seq, unit]),
    )
    from mauvealigner_tpu.genome import write_fasta

    write_fasta(g, "g.fa")
    assert main(["mauveAligner", "g.fa", "--seed-size=9", "--repeats",
                 "--output=reps.mln"]) == 0
    from mauvealigner_tpu.core.mln import read_match_list

    ml, _, _ = read_match_list("reps.mln")
    assert len(ml) > 0


def test_apply_backbone_cli(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc = simulate.random_genome(rng, 1200)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    from mauvealigner_tpu.genome import write_fasta

    write_fasta(anc, "a.fa")
    write_fasta(der, "b.fa")
    assert main(["progressiveMauve", "a.fa", "b.fa", "--seed-weight=11",
                 "--output=pm.xmfa"]) == 0
    import os

    if not os.path.exists("pm.xmfa.bbcols"):
        pytest.skip("no backbone emitted")
    assert main(["progressiveMauve", "pm.xmfa", "a.fa", "b.fa",
                 "--apply-backbone=pm.xmfa.bbcols", "--output=applied.xmfa"]) == 0
    assert os.path.exists("applied.xmfa")

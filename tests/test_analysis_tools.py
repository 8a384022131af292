import io
import os

import numpy as np
import pytest

from mauvealigner_tpu.analysis.evd import (
    merge_evd_results,
    score_excursions,
    significance_threshold,
    simulate_evd,
)
from mauvealigner_tpu.analysis.repeat_score import (
    parse_repeatmasker,
    score_alu,
    score_procrast_alignment,
)
from mauvealigner_tpu.models.repeatoire import (
    RepeatFamily,
    read_repeats_xmfa,
    write_repeats_xmfa,
)
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.tools.cli import main
from mauvealigner_tpu.utils import simulate


def test_score_excursions():
    scores = np.array([5, 5, -20, 3, 3, 3, -1, -20, 2])
    h = score_excursions(scores)
    assert list(h) == [10.0, 9.0, 2.0]


def test_simulate_evd_reasonable():
    res = simulate_evd(seq_length=3000, n_trials=5)
    assert res.n_excursions > 10
    assert res.gumbel_lambda > 0
    thr = significance_threshold(res, 0.01)
    assert thr > res.mean_height


def test_merge_evd():
    a = simulate_evd(seq_length=2000, n_trials=3, seed=1)
    b = simulate_evd(seq_length=2000, n_trials=3, seed=2)
    m = merge_evd_results([a, b])
    assert m.n_excursions == a.n_excursions + b.n_excursions


def _fam(starts, length):
    return RepeatFamily(np.array(starts, np.int64), np.ones((len(starts), length), bool))


def test_score_procrast_alignment_perfect():
    fams = [_fam([100, 500], 50)]
    s = score_procrast_alignment(fams, fams)
    assert s.sensitivity == 1.0 and s.ppv == 1.0


def test_score_procrast_alignment_partial():
    correct = [_fam([100, 500], 50)]
    calc = [_fam([100, 500], 25)]  # only half the columns
    s = score_procrast_alignment(correct, calc)
    assert s.ppv == 1.0
    assert 0.4 < s.sensitivity < 0.6


def test_repeats_xmfa_roundtrip(rng, tmp_path):
    g = simulate.random_genome(rng, 800)
    fams = [_fam([101, 401], 60)]
    path = str(tmp_path / "r.xmfa")
    write_repeats_xmfa(fams, g, path)
    back = read_repeats_xmfa(path)
    assert len(back) == 1
    assert np.array_equal(back[0].starts, fams[0].starts)
    assert back[0].n_cols == 60


def test_repeatmasker_parse_and_score():
    rm = """   SW   perc perc perc  query     position in query
score   div. del. ins.  sequence  begin end (left) repeat        class/family
  463   11.5  0.0  0.0  chr1      101   250 (1000) + AluYa5     SINE/Alu     1 150 (0) 1
  312   15.2  1.1  0.0  chr1      601   700 (500)  C AluSx      SINE/Alu     (0) 150 20 2
"""
    recs = parse_repeatmasker(io.StringIO(rm))
    assert len(recs) == 2
    assert recs[0].begin == 101 and recs[0].end == 250
    assert recs[1].strand == -1
    fams = [_fam([101, 601], 100)]
    stats = score_alu(fams, recs)
    assert stats["sensitivity"] > 0.7
    assert stats["ppv"] > 0.9


def test_evd_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["evd", "--length=2000", "--trials=3", "--output=e1.txt"]) == 0
    assert main(["evd", "--length=2000", "--trials=3", "--output=e2.txt"]) == 0
    assert main(["multiEVD", "e1.txt", "e2.txt"]) == 0
    out = capsys.readouterr().out
    assert "lambda" in out


def test_bb_analyze_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with open("bb.backbone", "w") as fh:
        fh.write("seq0_leftend\tseq0_rightend\tseq1_leftend\tseq1_rightend\n")
        fh.write("1\t500\t1\t480\n")
        fh.write("601\t900\t0\t0\n")
    assert main(["bbAnalyze", "bb.backbone", "report.txt"]) == 0
    text = open("report.txt").read()
    assert "core segments: 1" in text
    assert "variable segments: 1" in text


def test_bb_break_on_genes(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    gbk = """LOCUS       TEST                  1000 bp    DNA     linear UNK
FEATURES             Location/Qualifiers
     CDS             201..400
                     /gene="g1"
ORIGIN
"""
    seq = "acgt" * 250
    lines = [f"{i+1:>9} {seq[i:i+60]}" for i in range(0, 1000, 60)]
    with open("ref.gbk", "w") as fh:
        fh.write(gbk + "\n".join(lines) + "\n//\n")
    with open("g2.fa", "w") as fh:
        fh.write(">g2\n" + seq.upper() + "\n")
    from mauvealigner_tpu.core.interval import Interval, IntervalList

    g0 = Genome.from_string(seq.upper(), name="ref")
    g1 = Genome.from_string(seq.upper(), name="g2")
    ivl = IntervalList(
        genomes=[g0, g1],
        intervals=[Interval(np.array([1, 1], np.int64), np.ones((2, 1000), bool))],
        seq_filenames=["ref.gbk", "g2.fa"],
    )
    ivl.write_xmfa("a.xmfa")
    # GenBank mode: gene bounds from CDS features -> cuts at 201 and 401
    assert main(["bbBreakOnGenes", "a.xmfa", "20", "broken.txt"]) == 0
    rows = [l for l in open("broken.txt").read().splitlines()
            if l and not l.startswith("seq0")]
    assert len(rows) == 3
    lefts = sorted(int(r.split("\t")[0]) for r in rows)
    assert lefts == [1, 201, 401]
    # ptt mode breaks on BOTH sides of each gene edge
    # (bounds lend-1, lend, rend, rend+1 -- src/bbBreakOnGenes.cpp:276-280)
    with open("ref.ptt", "w") as fh:
        fh.write("h1\nh2\nh3\n201..400\t+\t66\tg1\n")
    with open("empty.ptt", "w") as fh:
        fh.write("h1\nh2\nh3\n")
    assert main(
        ["bbBreakOnGenes", "a.xmfa", "20", "b2.txt", "ref.ptt", "empty.ptt"]
    ) == 0
    rows = [l for l in open("b2.txt").read().splitlines()
            if l and not l.startswith("seq0")]
    lefts = sorted(int(r.split("\t")[0]) for r in rows)
    assert lefts == [1, 200, 201, 400, 401]


# ---------------- reference-convention scoreAlignment counters ----------------

def _two_seq_ivl(aln0, aln1, g0len=6, g1len=6):
    from mauvealigner_tpu.core.interval import Interval, IntervalList

    g0 = Genome.from_string("A" * g0len, name="g0")
    g1 = Genome.from_string("A" * g1len, name="g1")
    iv = Interval(
        np.array([1, 1], np.int64),
        np.stack([np.array(aln0, bool), np.array(aln1, bool)]),
    )
    return IntervalList(genomes=[g0, g1], intervals=[iv])


def test_reference_counters_missed_pair_in_aligned_region_is_fp():
    """Calc aligns the base to a gap where correct pairs it -> FP
    (src/scoreAlignment.cpp:433-437), counted once per direction."""
    from mauvealigner_tpu.analysis.score_alignment import reference_counters

    correct = _two_seq_ivl([1, 1, 1, 1], [1, 1, 1, 1])
    calc = _two_seq_ivl([1, 1, 1, 1, 0], [1, 1, 1, 0, 1])
    rc = reference_counters(correct, calc, [6, 6])
    assert (rc.tp, rc.fp, rc.fn, rc.tn) == (6, 2, 0, 0)
    assert rc.total == 8
    assert rc.unaligned_fn == 0


def test_reference_counters_overalignment_is_fn():
    """Calc pairs two bases where correct aligns each to a gap -> FN
    (src/scoreAlignment.cpp:428-429)."""
    from mauvealigner_tpu.analysis.score_alignment import reference_counters

    correct = _two_seq_ivl([1, 1, 1, 1, 0], [1, 1, 1, 0, 1])
    calc = _two_seq_ivl([1, 1, 1, 1], [1, 1, 1, 1])
    rc = reference_counters(correct, calc, [6, 6])
    assert (rc.tp, rc.fp, rc.fn, rc.tn) == (6, 0, 2, 0)


def test_reference_counters_unaligned_miss_is_fn():
    """A correct pair whose base sits in NO calculated interval -> FN via
    unaligned_fn (src/scoreAlignment.cpp:352-355)."""
    from mauvealigner_tpu.analysis.score_alignment import reference_counters

    correct = _two_seq_ivl([1, 1, 1, 1], [1, 1, 1, 1])
    calc = _two_seq_ivl([1, 1, 1], [1, 1, 1])
    rc = reference_counters(correct, calc, [6, 6])
    assert (rc.tp, rc.fn) == (6, 2)
    assert rc.unaligned_fn == 2
    assert rc.fp == 0


def test_reference_counters_perfect_alignment():
    from mauvealigner_tpu.analysis.score_alignment import reference_counters

    correct = _two_seq_ivl([1, 1, 1, 1, 0], [1, 1, 1, 0, 1])
    rc = reference_counters(correct, correct, [6, 6])
    assert rc.fp == 0 and rc.fn == 0
    assert rc.tp == 6 and rc.tn == 2  # the two gap-aligned bases, per direction
    assert "Sensitivity: TP / TP + FN = 1" in rc.summary()


def test_bb_filter_mean_length_and_informative_only():
    """ShorterThan drops rows with integer-mean member length < threshold
    (src/bbFilter.cpp:21-37); feature matrices exclude constant patterns
    (good_bb, :117-140)."""
    from mauvealigner_tpu.tools.backbone_tools import (
        add_unique_segments_rows,
        bb_filter,
        presence_absence_matrix,
    )

    rows = [
        np.array([1, 40, 1, 40], np.int64),       # mean 40 -> kept, but constant
        np.array([41, 65, 0, 0], np.int64),       # mean 25 -> kept, informative
        np.array([66, 75, 41, 65], np.int64),     # (10+25)//2 = 17 -> dropped
        np.array([0, 0, 66, 70], np.int64),       # mean 5 -> dropped
    ]
    kept = bb_filter(rows, min_length=20)
    assert len(kept) == 2
    m = presence_absence_matrix(kept, 2, informative_only=True)
    # only the genome-0-unique row is informative
    assert m.shape == (1, 2)
    assert m.tolist() == [[1, 0]]
    # unique-segment synthesis: genome 1 is uncovered over [66, 75] after
    # the rows above (its max coord is 65 from row idx 2 -> no gap), genome 0
    # fully covered -> nothing new except trailing regions within max coords
    rows2 = [
        np.array([1, 30, 1, 30], np.int64),
        np.array([51, 80, 31, 60], np.int64),
    ]
    aug = add_unique_segments_rows(rows2)
    extra = [r.tolist() for r in aug[2:]]
    assert [31, 50, 0, 0] in extra  # genome-0 hole between the two rows
    assert all(r[0] != 0 or r[2] != 0 for r in aug)


def test_evd_alignjob_mode(tmp_path, rng, monkeypatch):
    """Reference evd/multiEVD mode: read alignjob.N/evolved.dat + seqs,
    collect inverted-score excursions, print quantile thresholds
    (src/evd.cpp:80-128, src/multiEVD.cpp:99-190)."""
    from mauvealigner_tpu.core.interval import Interval, IntervalList
    from mauvealigner_tpu.genome import write_fasta

    monkeypatch.chdir(tmp_path)
    for run in range(2):
        d = tmp_path / f"alignjob.{run}"
        d.mkdir()
        anc = simulate.random_genome(rng, 2000, name="s0")
        g0 = Genome(anc.seq.copy(), name="s0")
        # g1 = same sequence with a junk region: inverted scores spike there
        seq1 = anc.seq.copy()
        seq1[800:1000] = simulate.random_genome(rng, 200).seq
        g1 = Genome(seq1, name="s1")
        iv = Interval(np.array([1, 1], np.int64), np.ones((2, 2000), bool))
        ivl = IntervalList(genomes=[g0, g1], intervals=[iv],
                           seq_filenames=["s0", "s1"])
        ivl.write_xmfa(str(d / "evolved.dat"))
        with open(d / "evolved_seqs.fas", "w") as fh:
            for g in (g0, g1):
                fh.write(f">{g.name}\n{g.to_string()}\n")
    assert main(["evd", "2"]) == 0
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["evd", "2", "--output=-"]) == 0
    out = buf.getvalue()
    assert "Total number of simulations: 2" in out
    assert "95% score threshold:" in out
    # the junk bout guarantees at least one excursion per run
    import re

    m = re.search(r"Total number of excursions: (\d+)", out)
    assert m and int(m.group(1)) >= 2
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        assert main(["multiEVD", "2"]) == 0
    assert "multiplicity 2:" in buf2.getvalue()


def test_bb_analyze_alternalog_breakdown():
    """Alternalog classification vs reference annotations: genic/spanner,
    RNA containment, intergenic neighbor orientation
    (src/bbAnalyze.cpp:816-931)."""
    import io

    from mauvealigner_tpu.analysis.bb_analyze import bb_analyze_report
    from mauvealigner_tpu.genome.sequence import Feature

    ref = Genome.from_string("A" * 2000, name="ref")
    ref.features = [
        Feature("CDS", 100, 400, 1),
        Feature("CDS", 700, 900, -1),    # converging with the first
        Feature("CDS", 1200, 1400, 1),   # diverging with the second
        Feature("tRNA", 1500, 1550, 1),
        Feature("CDS", 1700, 1900, 1),
    ]
    rows = [
        np.array([150, 350, 150, 350], np.int64),   # genic (inside CDS 1), core
        np.array([380, 450, 0, 0], np.int64),       # spanner, variable
        np.array([500, 600, 0, 0], np.int64),       # intergenic converging
        np.array([950, 1100, 0, 0], np.int64),      # intergenic diverging
        np.array([1450, 1600, 0, 0], np.int64),     # contains tRNA
    ]
    buf = io.StringIO()
    reps = bb_analyze_report(rows, 2, ref, out=buf)
    assert reps[0].genic and not reps[0].is_variable
    assert reps[1].spanner and reps[1].is_variable
    assert reps[2].neighbor == "converging"
    assert reps[3].neighbor == "diverging"
    assert reps[4].contains_trna
    text = buf.getvalue()
    assert "There are 1 intergenic segments surrounded by converging CDS" in text
    assert "There are 1 intergenic segments surrounded by diverging CDS" in text
    assert "variable sites spanning CDS boundaries: 1" in text

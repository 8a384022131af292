"""CLI tool tests: run every registered tool end-to-end on small inputs."""

import io
import os

import numpy as np
import pytest

from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome import write_fasta
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.tools.cli import TOOLS, main
from mauvealigner_tpu.utils import simulate


@pytest.fixture
def workdir(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc = simulate.random_genome(rng, 1200)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.001, del_rate=0.001)
    write_fasta(anc, "a.fa")
    write_fasta(der, "b.fa")
    buf = io.StringIO()
    truth.seq_filenames = ["a.fa", "b.fa"]
    truth.write_xmfa("truth.xmfa")
    return tmp_path


def run(args):
    return main(args)


def test_tool_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in ("mauveAligner", "progressiveMauve", "scoreAlignment", "xmfa2maf"):
        assert name in out


def test_mauve_aligner_cli(workdir, capsys):
    rc = run(
        [
            "mauveAligner",
            "a.fa",
            "b.fa",
            "--seed-size=11",
            "--output=matches.mln",
            "--output-alignment=out.xmfa",
            "--id-matrix=id.txt",
        ]
    )
    assert rc == 0
    assert os.path.exists("out.xmfa")
    assert os.path.exists("id.txt")
    text = open("out.xmfa").read()
    assert "#FormatVersion Mauve1" in text


def test_progressive_mauve_cli_and_score(workdir, capsys):
    rc = run(
        ["progressiveMauve", "a.fa", "b.fa", "--seed-weight=11", "--output=pm.xmfa"]
    )
    assert rc == 0
    assert os.path.exists("pm.xmfa")
    assert os.path.exists("pm.xmfa.guide_tree")
    rc = run(["scoreAlignment", "truth.xmfa", "pm.xmfa", "a.fa", "b.fa"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Sensitivity:" in out
    sn = float([l for l in out.splitlines() if l.startswith("Sensitivity")][0].split()[1])
    assert sn > 0.8


def test_mums_output_roundtrip(workdir):
    rc = run(["mauveAligner", "a.fa", "b.fa", "--seed-size=11", "--mums", "--output=m.mln"])
    assert rc == 0
    from mauvealigner_tpu.core.mln import read_match_list

    ml, names, lens = read_match_list("m.mln")
    assert len(ml) > 0
    assert names[0] == "a.fa"
    assert lens[0] == 1200


def test_converters_on_alignment(workdir, capsys):
    run(["progressiveMauve", "a.fa", "b.fa", "--seed-weight=11", "--output=pm.xmfa", "--no-backbone"])
    assert run(["xmfa2maf", "pm.xmfa", "out.maf", "a.fa", "b.fa"]) == 0
    maf = open("out.maf").read()
    assert maf.startswith("##maf")
    assert "\ns " in maf
    assert run(["toMultiFastA", "pm.xmfa", "gapblock", "a.fa", "b.fa"]) == 0
    assert run(["gappiness", "gapblock.lcb_0"]) == 0
    out = capsys.readouterr().out
    assert "aln_length\t" in out and "percent_id\t" in out
    assert run(["stripGapColumns", "pm.xmfa", "sgc.xmfa", "a.fa", "b.fa"]) == 0
    assert run(["stripSubsetLCBs", "pm.xmfa", "ssl.xmfa", "--min-seqs=2", "--min-length=10", "a.fa", "b.fa"]) == 0
    assert run(["alignmentProjector", "pm.xmfa", "proj.xmfa", "--seqs=0,1", "a.fa", "b.fa"]) == 0
    assert run(["projectAndStrip", "pm.xmfa", "pas.xmfa", "--seqs=0,1", "a.fa", "b.fa"]) == 0
    assert run(["getAlignmentWindows", "pm.xmfa", "win.xmfa", "--window=100", "a.fa", "b.fa"]) == 0
    assert run(["getAlignmentWindows", "pm.xmfa", "windir", "--window=100", "--step=50", "a.fa", "b.fa"]) == 0
    import glob as _glob
    wfiles = _glob.glob("windir/interval_*/window_*_to_*.mfa")
    assert wfiles and all(open(w).read().startswith(">") for w in wfiles[:2])
    assert run(["joinAlignmentFiles", "joined.xmfa", "pm.xmfa", "pm.xmfa"]) == 0
    assert run(["addUnalignedIntervals", "pm.xmfa", "aui.xmfa", "a.fa", "b.fa"]) == 0
    assert run(["toMultiFastA", "pm.xmfa", "block", "a.fa", "b.fa"]) == 0
    assert run(["toGrimmFormat", "pm.xmfa", "grimm.txt", "a.fa", "b.fa"]) == 0
    assert run(["makeBadgerMatrix", "pm.xmfa", "badger.txt", "--lcb-coordinates=lcbs.txt", "a.fa", "b.fa"]) == 0
    assert run(["makeMc4Matrix", "pm.xmfa", "mc4.txt", "a.fa", "b.fa"]) == 0
    assert run(["toEvoHighwayFormat", "pm.xmfa", "evo.txt", "a.fa", "b.fa"]) == 0
    assert run(["countInPlaceInversions", "pm.xmfa", "a.fa", "b.fa"]) == 0
    with open("coords.txt", "w") as fh:
        fh.write("0 50\n0 120\n")
    capsys.readouterr()  # drain earlier tool output
    assert run(["coordinateTranslate", "pm.xmfa", "coords.txt", "--seq-files=a.fa,b.fa"]) == 0
    rows = [l.split("\t") for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 2 and all(len(r) == 2 for r in rows)
    assert run(["coordinateTranslate", "pm.xmfa", "--seq=0", "--position=50", "--seq-files=a.fa,b.fa"]) == 0
    assert run(["extractSubalignments", "pm.xmfa", "sub.xmfa", "--seq=0", "--left=100", "--right=400", "a.fa", "b.fa"]) == 0
    assert run(["calculateCoverage", "pm.xmfa", "a.fa", "b.fa"]) == 0
    assert run(["pairCompare", "pm.xmfa"]) == 0


def test_backbone_tools(workdir, capsys):
    run(["progressiveMauve", "a.fa", "b.fa", "--seed-weight=11", "--output=pm.xmfa"])
    if not os.path.exists("pm.xmfa.backbone"):
        pytest.skip("no backbone emitted for this input")
    assert run(["bbFilter", "pm.xmfa.backbone", "bbf.txt", "--min-length=10"]) == 0
    assert run(["bbFilter", "pm.xmfa.backbone", "bb.xml", "--format=beast"]) == 0
    assert run(["calculateBackboneCoverage", "pm.xmfa.backbone", "a.fa", "b.fa"]) == 0
    assert run(["extractBackbone", "a.fa,b.fa", "pm.xmfa", "50", "50", "bb.xmfa"]) == 0
    assert open("bb.xmfa").read().count("=") >= 1
    assert run(["createBackboneMFA", "pm.xmfa", "bb.mfa", "--stride=1", "a.fa", "b.fa"]) == 0
    assert open("bb.mfa").read().startswith(">0")
    assert run(["createBackboneMFA", "pm.xmfa", "bbrows.mfa", "--rows=pm.xmfa.backbone", "a.fa", "b.fa"]) == 0
    assert run(["backbone_global_to_local", "pm.xmfa.backbone", "bbl.txt", "a.fa", "b.fa"]) == 0
    assert run(["unalign", "pm.xmfa", "unaligned.xmfa", "--bbcols=pm.xmfa.bbcols", "a.fa", "b.fa"]) == 0


def test_mfa2xmfa_and_raw(workdir):
    with open("aln.mfa", "w") as fh:
        fh.write(">x\nAC-GT\n>y\nACGG-\n")
    assert run(["mfa2xmfa", "aln.mfa", "conv.xmfa"]) == 0
    text = open("conv.xmfa").read()
    assert "AC-GT" in text
    assert run(["toRawSequence", "a.fa", "a.raw"]) == 0
    assert os.path.getsize("a.raw") == 1200
    assert run(["multiToRawSequence", "aln.mfa", "raw_"]) == 0
    assert os.path.exists("raw_0.raw")
    assert run(["toGBKsequence", "a.fa", "a.gbk"]) == 0
    assert "LOCUS" in open("a.gbk").read()
    assert run(["uniqueMerCount", "a.fa", "--seed-weight=9"]) == 0


def test_sort_contigs_cli(workdir, rng):
    # build a draft: 3 contigs shuffled + one inverted
    ref = simulate.random_genome(rng, 1500)
    from mauvealigner_tpu.genome.sequence import Contig, revcomp_ascii

    c1, c2, c3 = ref.seq[:500], ref.seq[500:1000], ref.seq[1000:]
    draft_seq = np.concatenate([c3, revcomp_ascii(c2), c1])
    draft = Genome(
        draft_seq,
        contigs=[Contig("c3", 500, 0), Contig("c2rc", 500, 500), Contig("c1", 500, 1000)],
    )
    write_fasta(ref, "ref.fa")
    write_fasta(draft, "draft.fa")
    assert run(["sortContigs", "ref.fa", "draft.fa", "--output=sorted.fa", "--seed-size=11"]) == 0
    from mauvealigner_tpu.genome import read_fasta

    sorted_g = read_fasta("sorted.fa")
    assert [c.name for c in sorted_g.contigs][:3] == ["c1", "c2rc", "c3"]
    # contig 2 re-oriented: reordered genome equals the reference
    assert sorted_g.to_string() == ref.to_string()


def test_tree_tools(workdir):
    with open("trees.nwk", "w") as fh:
        fh.write("((a:1,b:1):1,(c:1,d:1):1);\n")
        fh.write("((b:1,a:1):1,(c:1,d:1):1);\n")
        fh.write("((a:1,c:1):1,(b:1,d:1):1);\n")
    assert run(["uniquifyTrees", "trees.nwk", "uniq.nwk"]) == 0
    assert len(open("uniq.nwk").read().strip().splitlines()) == 2
    assert run(["rootTrees", "trees.nwk", "rooted.nwk", "--outgroup=c,d"]) == 0
    assert run(["checkForLGT", "trees.nwk", "--group-a=a,b", "--group-b=c,d"]) == 0
    trprobs = """#NEXUS
begin trees;
   translate
      1 a,
      2 b,
      3 c;
   tree tree_1 [p = 0.60] = ((1,2),3);
   tree tree_2 [p = 0.30] = ((1,3),2);
   tree tree_3 [p = 0.08] = ((2,3),1);
end;
"""
    with open("t.trprobs", "w") as fh:
        fh.write(trprobs)
    assert run(["extractBCITrees", "t.trprobs", "bci.nwk", "--credibility=0.9"]) == 0
    lines = open("bci.nwk").read().strip().splitlines()
    assert len(lines) == 2  # 0.6 + 0.3 >= 0.9


def test_mauve_aligner_mums_extras(workdir):
    rc = run(
        [
            "mauveAligner", "a.fa", "b.fa", "--seed-size=11", "--mums",
            "--eliminate-overlaps", "--n-way-filter",
            "--output=m.mln", "--coverage-output=cov.txt",
            "--output-guide-tree=gt.nwk",
        ]
    )
    assert rc == 0
    assert os.path.exists("m.mln")
    assert os.path.exists("cov.txt") and open("cov.txt").read().strip()
    assert open("gt.nwk").read().strip().endswith(";")


def test_mauve_aligner_extension_and_dir_output(workdir):
    rc = run(
        [
            "mauveAligner", "a.fa", "b.fa", "--seed-size=11",
            "--no-lcb-extension", "--max-extension-iterations=2",
            "--min-recursive-gap-length=100",
            "--output=m.mln", "--output-alignment=o.xmfa",
            "--alignment-output-dir=lcbs", "--alignment-output-format=clustal",
            "--permutation-matrix-output=perm.txt",
            "--permutation-matrix-min-weight=1",
            "--muscle-args=-maxiters 2", "--island-break-min=5",
        ]
    )
    assert rc == 0
    assert os.path.isdir("lcbs") and os.listdir("lcbs")
    assert "CLUSTAL" in open(os.path.join("lcbs", "lcb_0.txt")).read()
    assert os.path.exists("perm.txt")


def test_mauve_aligner_lcb_match_input(workdir):
    # produce an alignment, write its intervals as .mln, re-enter via
    # --match-input + --lcb-match-input
    rc = run(
        ["mauveAligner", "a.fa", "b.fa", "--seed-size=11",
         "--output=m.mln", "--output-alignment=o1.xmfa"]
    )
    assert rc == 0
    from mauvealigner_tpu.core import mln
    from mauvealigner_tpu.core.interval import IntervalList as IVL

    ivl = IVL.read_xmfa("o1.xmfa")
    from mauvealigner_tpu.tools.common import load_genomes

    ivl.genomes = load_genomes(["a.fa", "b.fa"])
    mln.write_interval_list(ivl, "ivs.mln")
    rc = run(
        ["mauveAligner", "a.fa", "b.fa", "--seed-size=11",
         "--match-input=ivs.mln", "--lcb-match-input",
         "--output=m2.mln", "--output-alignment=o2.xmfa"]
    )
    assert rc == 0
    assert os.path.exists("o2.xmfa")
    # re-entry reproduces a full-coverage alignment
    text = open("o2.xmfa").read()
    assert text.count("=") >= 1


def test_unalign_recovers_sequences(workdir, rng):
    """unalign reconstructs the exact input sequences from the XMFA
    (src/unalign.cpp: block concatenation + gap stripping)."""
    run(["progressiveMauve", "a.fa", "b.fa", "--seed-weight=11", "--output=u.xmfa", "--no-backbone"])
    assert run(["unalign", "u.xmfa", "recovered.mfa", "a.fa", "b.fa"]) == 0
    from mauvealigner_tpu.genome import read_fasta
    from mauvealigner_tpu.genome.fasta import read_fasta_records

    recs = read_fasta_records("recovered.mfa")
    assert len(recs) == 2
    for rec, src_file in zip(recs, ("a.fa", "b.fa")):
        assert rec.to_string() == read_fasta(src_file).to_string()


def test_extract_bci_aggregation(workdir):
    """Identical topologies across files sum their posteriors; the BCI
    cutoff stops reading; over-budget sets subsample by weight
    (src/extractBCITrees.cpp:193-368)."""
    trprobs = """#NEXUS
begin trees;
   translate
      1 taxA,
      2 taxB,
      3 taxC,
      4 taxD;
   tree tree_1 [p = 0.40] [P = 0.40] = [&W 0.40] ((1,2),(3,4));
   tree tree_2 [p = 0.35] [P = 0.75] = [&W 0.35] ((2,1),(4,3));
   tree tree_3 [p = 0.10] [P = 0.85] = [&W 0.10] ((1,3),(2,4));
   tree tree_4 [p = 0.08] [P = 0.93] = [&W 0.08] ((1,4),(2,3));
end;
"""
    with open("t1.trprobs", "w") as fh:
        fh.write(trprobs)
    with open("t2.trprobs", "w") as fh:
        fh.write(trprobs)
    from mauvealigner_tpu.tools.tree_tools import aggregate_bci_trees

    uniq = aggregate_bci_trees([trprobs, trprobs], bci_threshold=0.9)
    # trees 1 and 2 merge (same topology); tree 4 is the crossing tree
    # (cumulative 0.85 < 0.9 before it) so it joins the credible set.
    assert len(uniq) == 3
    assert uniq[0][1] == pytest.approx(2 * 0.75)
    assert uniq[1][1] == pytest.approx(2 * 0.10)
    assert uniq[2][1] == pytest.approx(2 * 0.08)
    # a dominant first topology must NOT produce an empty set
    solo = aggregate_bci_trees([trprobs], bci_threshold=0.3)
    assert len(solo) >= 1
    assert run(["extractBCITrees", "t1.trprobs", "t2.trprobs", "bci2.nwk",
                "--credibility=0.9", "--max-trees=1"]) == 0
    out = open("bci2.nwk").read()
    assert out.count("(") >= 1 and len(out.strip().splitlines()) == 1

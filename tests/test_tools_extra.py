"""End-to-end CLI coverage for the less-traveled tools:
scoreProcrastAlignment, scoreALU, transposeCoordinates, mauveToXMFA,
calculateBackboneCoverage2, extractBackbone2, getOrthologList,
randomGeneSample."""

import os

import numpy as np
import pytest

from mauvealigner_tpu.genome import write_fasta
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.tools.cli import main
from mauvealigner_tpu.utils import simulate


def _genome_with_repeats(rng, n_copies=3, unit_len=150, spacer=300):
    unit = simulate.random_genome(rng, unit_len).seq
    parts = [simulate.random_genome(rng, spacer).seq]
    lefts = []
    pos = spacer
    for _ in range(n_copies):
        parts.append(unit.copy())
        lefts.append(pos + 1)
        pos += unit_len
        parts.append(simulate.random_genome(rng, spacer).seq)
        pos += spacer
    return Genome(np.concatenate(parts), name="reps"), lefts, unit_len


@pytest.fixture
def repeat_workdir(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g, lefts, unit_len = _genome_with_repeats(rng)
    write_fasta(g, "g.fa")
    rc = main(["repeatoire", "--sequence=g.fa", "--z=9", "--output=reps.xmfa"])
    assert rc == 0
    return lefts, unit_len


def test_score_procrast_alignment(repeat_workdir, capsys):
    # a computed repeat alignment scored against itself is perfect
    rc = main(["scoreProcrastAlignment", "reps.xmfa", "reps.xmfa"])
    assert rc == 0
    out = capsys.readouterr().out.lower()
    assert "sensitivity" in out or "sn" in out


def test_score_alu(repeat_workdir, capsys):
    lefts, unit_len = repeat_workdir
    # RepeatMasker .out records covering the planted units
    with open("rm.out", "w") as fh:
        fh.write("   SW   perc perc perc  query    begin  end  (left)  strand"
                 "  repeat        class/family\n\n")
        for l in lefts:
            fh.write(
                f"  225  10.0  0.0  0.0  reps  {l}  {l + unit_len - 1}  (0)  +"
                f"  AluY  SINE/Alu\n"
            )
    rc = main(["scoreALU", "reps.xmfa", "rm.out"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "annotated" in out or "recovered" in out or "detected" in out


@pytest.fixture
def aligned_workdir(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc = simulate.random_genome(rng, 1500)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.001, del_rate=0.001)
    write_fasta(anc, "a.fa")
    write_fasta(der, "b.fa")
    rc = main(
        ["progressiveMauve", "a.fa", "b.fa", "--seed-weight=9", "--output=pm.xmfa"]
    )
    assert rc == 0
    assert os.path.exists("pm.xmfa.backbone")
    return anc, der


def test_calculate_backbone_coverage2(aligned_workdir, capsys):
    rc = main(["calculateBackboneCoverage2", "pm.xmfa", "50", "50", "a.fa", "b.fa"])
    assert rc == 0
    out = capsys.readouterr().out
    covs = [float(l.rsplit("= ", 1)[1]) for l in out.splitlines()
            if l.startswith("Genome ")]
    assert len(covs) == 2 and all(0.0 <= c <= 1.5 for c in covs)
    assert max(covs) > 0.5  # mostly-homologous pair
    assert "backbone segments" in out and "Identity matrix:" in out


def test_extract_backbone2(aligned_workdir):
    # build a .mln from the xmfa, then extract backbone regions as .mln
    from mauvealigner_tpu.core import mln
    from mauvealigner_tpu.core.interval import IntervalList
    from mauvealigner_tpu.tools.common import load_genomes

    ivl = IntervalList.read_xmfa("pm.xmfa")
    ivl.genomes = load_genomes(["a.fa", "b.fa"])
    mln.write_interval_list(ivl, "pm.mln")
    rc = main(["extractBackbone2", "pm.mln", "50", "50", "bb.mln", "a.fa", "b.fa"])
    assert rc == 0
    assert os.path.getsize("bb.mln") > 0
    out = mln.read_interval_list("bb.mln")
    assert len(out.intervals) >= 1


def test_mauve_to_xmfa(aligned_workdir):
    from mauvealigner_tpu.core import mln
    from mauvealigner_tpu.core.interval import IntervalList

    ivl = IntervalList.read_xmfa("pm.xmfa")
    with open("aln.mln", "w") as fh:
        mln.write_interval_list(ivl, fh)
    rc = main(["mauveToXMFA", "aln.mln", "roundtrip.xmfa", "a.fa", "b.fa"])
    assert rc == 0
    ivl2 = IntervalList.read_xmfa("roundtrip.xmfa")
    assert len(ivl2.intervals) == len(ivl.intervals)


def test_transpose_coordinates(aligned_workdir):
    from mauvealigner_tpu.core import mln

    rc = main(["mauveAligner", "a.fa", "b.fa", "--seed-size=9", "--mums",
               "--output=m.mln"])
    assert rc == 0
    ml, _, _ = mln.read_match_list("m.mln")
    # one masked region of 100bp removed at position 1 of sequence 0:
    # every seq-0 coordinate >= 1 shifts right by 100
    with open("regions.tsv", "w") as fh:
        fh.write("0\t1\t100\n")
    rc = main(["transposeCoordinates", "m.mln", "regions.tsv", "t.mln"])
    assert rc == 0
    ml2, _, _ = mln.read_match_list("t.mln")
    assert len(ml2) == len(ml)
    before = np.abs(ml.starts[:, 0])
    after = np.abs(ml2.starts[:, 0])
    assert ((after - before)[before > 0] == 100).all()
    # other sequence untouched
    assert np.array_equal(ml.starts[:, 1], ml2.starts[:, 1])


GBK_TEMPLATE = """LOCUS       anc{length:>17} bp    DNA     linear   UNA
FEATURES             Location/Qualifiers
     CDS             101..400
                     /gene="orfA"
     CDS             complement(601..900)
                     /gene="orfB"
ORIGIN
{origin}
//
"""


def _write_gbk(path, seq_text):
    rows = []
    for i in range(0, len(seq_text), 60):
        chunk = seq_text[i : i + 60]
        grouped = " ".join(chunk[j : j + 10] for j in range(0, len(chunk), 10))
        rows.append(f"{i + 1:>9} {grouped}")
    with open(path, "w") as fh:
        fh.write(GBK_TEMPLATE.format(length=len(seq_text), origin="\n".join(rows)))


def test_get_ortholog_list_and_random_gene_sample(aligned_workdir, rng):
    anc, der = aligned_workdir
    _write_gbk("a.gbk", anc.to_string().lower())
    _write_gbk("b.gbk", der.to_string().lower())
    rc = main(["getOrthologList", "pm.xmfa", "pm.xmfa.backbone", "orthos.tsv",
               "--cds-base=cds", "a.gbk", "b.gbk"])
    assert rc == 0
    lines = [l for l in open("orthos.tsv").read().splitlines() if l.strip()]
    # header + both CDS features (each annotated in both genomes)
    assert lines[0].startswith("OrthoID\tGI_in_Genome_0")
    assert len(lines) == 3
    assert any("orfA" in l for l in lines[1:])
    assert os.path.exists("cds_0.fas")
    # coverage/identity columns are sane fractions
    for l in lines[1:]:
        cols = l.split("\t")
        assert 0.0 <= float(cols[3]) <= 1.0 and 0.5 <= float(cols[4]) <= 1.0
    rc = main(["randomGeneSample", "pm.xmfa", "pm.xmfa.backbone", "genealn",
               "--count=1", "a.gbk", "b.gbk"])
    assert rc == 0
    assert os.path.exists("genealn_0.fas")
    assert open("genealn_0.fas").read().startswith(">seq0")


def test_xmfa2maf_contig_local_rows(rng):
    """MAF rows are contig-local: src is file.contig, srcSize the contig
    length, start within the contig; blocks split at contig boundaries
    (src/xmfa2maf.cpp:43-80)."""
    import io

    from mauvealigner_tpu.core.interval import Interval, IntervalList
    from mauvealigner_tpu.genome.sequence import Contig
    from mauvealigner_tpu.tools.convert import xmfa2maf
    from mauvealigner_tpu.utils import simulate

    g0 = simulate.random_genome(rng, 200, name="g0")
    g1 = Genome(
        g0.seq.copy(),
        contigs=[Contig("ctgA", 120, 0), Contig("ctgB", 80, 120)],
        name="g1",
    )
    iv = Interval(np.array([1, 1], np.int64), np.ones((2, 200), bool))
    ivl = IntervalList(genomes=[g0, g1], intervals=[iv],
                       seq_filenames=["g0.fa", "g1.fa"])
    buf = io.StringIO()
    xmfa2maf(ivl, buf)
    maf = buf.getvalue()
    blocks = [b for b in maf.split("a score=0\n") if b.strip() and not b.startswith("##")]
    assert len(blocks) == 2  # split at the ctgA/ctgB boundary
    rows1 = [l for l in blocks[0].splitlines() if l.startswith("s ")]
    rows2 = [l for l in blocks[1].splitlines() if l.startswith("s ")]
    # g1's first block row: contig ctgA, local start 0, size 120, srcSize 120
    r = [x for x in rows1 if "g1" in x][0].split()
    assert r[1].endswith(".ctgA") and r[2] == "0" and r[3] == "120" and r[5] == "120"
    r = [x for x in rows2 if "g1" in x][0].split()
    assert r[1].endswith(".ctgB") and r[2] == "0" and r[3] == "80" and r[5] == "80"
    # g0 (single contig, named): coordinates span the whole genome
    r = [x for x in rows2 if "g0" in x][0].split()
    assert r[2] == "120" and r[3] == "80" and r[5] == "200"


def test_to_grimm_multichromosome_split(rng):
    """Multichromosomal GRIMM: a ` $` separator whenever the LCB walk
    crosses a chromosome boundary (src/toGrimmFormat.cpp:64-72)."""
    import io

    from mauvealigner_tpu.models.lcb import LCB
    from mauvealigner_tpu.tools.convert import to_grimm_format

    def mk(lefts, rights, strands):
        return LCB(
            np.array([0]),
            1.0,
            np.array(lefts, np.int64),
            np.array(rights, np.int64),
            np.array(strands, np.int8),
        )

    # genome 0: LCBs at 100, 600, 1100; chromosomes end at 500, 1500
    lcbs = [
        mk([100, 100], [200, 200], [1, 1]),
        mk([600, 300], [700, 400], [1, -1]),
        mk([1100, 500], [1200, 600], [-1, 1]),
    ]
    buf = io.StringIO()
    to_grimm_format(lcbs, ["g0", "g1"], buf, chr_bounds=[[500, 1500], []])
    out = buf.getvalue()
    block0 = out.split(">g0\n")[1].split(">g1")[0]
    assert block0 == "1 $\n2 3 $\n" or block0 == "1 $\n2 -3 $\n", repr(block0)
    assert "-3" in block0  # third LCB inverted in genome 0
    block1 = out.split(">g1\n")[1]
    assert block1.strip().endswith("$")


def test_badger_and_mc4_formats(rng):
    """Reference formats: badger rows are name-prefixed comma lists with
    signs relative to the block's first present sequence
    (src/makeBadgerMatrix.cpp:86-99); MC4 emits doubled permutations with
    genome-0-normalized orientations (src/makeMc4Matrix.cpp:64-95)."""
    import io

    from mauvealigner_tpu.core.interval import Interval, IntervalList
    from mauvealigner_tpu.tools.convert import make_badger_matrix, make_mc4_matrix

    g0 = simulate.random_genome(rng, 300, name="g0")
    g1 = simulate.random_genome(rng, 300, name="g1")
    # block 1: fwd/fwd at (1, 101); block 2: fwd/rev at (101, -1)
    b1 = Interval(np.array([1, 101], np.int64), np.ones((2, 100), bool))
    b2 = Interval(np.array([101, -1], np.int64), np.ones((2, 100), bool))
    ivl = IntervalList(genomes=[g0, g1], intervals=[b1, b2],
                       seq_filenames=["g0", "g1"])
    buf = io.StringIO()
    coords = io.StringIO()
    make_badger_matrix(ivl, buf, coords)
    lines = buf.getvalue().splitlines()
    assert lines[0] == "g0,1,2"
    # genome 1 order: block 2 first (left end 1, reverse => sign -)
    assert lines[1] == "g1,-2,1"
    clines = coords.getvalue().splitlines()
    assert clines[1] == "1\t100\t101\t200"
    assert clines[2] == "101\t200\t-1\t-100"
    buf2 = io.StringIO()
    make_mc4_matrix(ivl, buf2)
    m = buf2.getvalue().splitlines()
    assert m[0] == "g0,0,1,2,3,4,0"
    assert m[1] == "standard,1,2"
    # genome 1: block 2 (id 2, reverse => 4,3) precedes block 1 (1,2)
    assert m[2] == "g1,0,4,3,1,2,0"
    assert m[3] == "standard,-2,1"


def test_in_place_inversions(rng):
    """An LCB with identical neighbors in every genome but minority
    orientation in one sequence is an in-place inversion
    (src/countInPlaceInversions.cpp:35-67)."""
    from mauvealigner_tpu.models.lcb import LCB
    from mauvealigner_tpu.tools.convert import (
        count_in_place_inversions,
        find_in_place_inversions,
    )

    def mk(lefts, rights, strands):
        return LCB(np.array([0]), 1.0, np.array(lefts, np.int64),
                   np.array(rights, np.int64), np.array(strands, np.int8))

    # 3 genomes, 3 collinear LCBs; middle LCB reversed only in genome 2
    lcbs = [
        mk([1, 1, 1], [100, 100, 100], [1, 1, 1]),
        mk([101, 101, 101], [200, 200, 200], [1, 1, -1]),
        mk([201, 201, 201], [300, 300, 300], [1, 1, 1]),
    ]
    inv = find_in_place_inversions(lcbs)
    assert inv == [(1, 2, -101, -200)]
    assert count_in_place_inversions(lcbs) == 1
    # transposed middle block in genome 2: neighbors differ -> not in place
    lcbs2 = [
        mk([1, 1, 1], [100, 100, 100], [1, 1, 1]),
        mk([101, 101, 250], [200, 200, 349], [1, 1, -1]),
        mk([201, 201, 101], [300, 300, 200], [1, 1, 1]),
    ]
    assert find_in_place_inversions(lcbs2) == []


def test_xmfa2maf_reverse_strand_contig_split(rng):
    """A reverse-strand row crossing a contig boundary must split into
    valid contig-local MAF rows (0 <= start, start+size <= srcSize)."""
    import io

    from mauvealigner_tpu.core.interval import Interval, IntervalList
    from mauvealigner_tpu.genome.sequence import Contig, revcomp_ascii
    from mauvealigner_tpu.tools.convert import xmfa2maf
    from mauvealigner_tpu.utils import simulate

    g0 = simulate.random_genome(rng, 200, name="g0")
    g1 = Genome(
        revcomp_ascii(g0.seq),
        contigs=[Contig("ctgA", 120, 0), Contig("ctgB", 80, 120)],
        name="g1",
    )
    # g1 aligned reverse: its row walks coordinates 200..1 across ctgB|ctgA
    iv = Interval(np.array([1, -1], np.int64), np.ones((2, 200), bool))
    ivl = IntervalList(genomes=[g0, g1], intervals=[iv],
                       seq_filenames=["g0.fa", "g1.fa"])
    buf = io.StringIO()
    xmfa2maf(ivl, buf)
    rows = [l.split() for l in buf.getvalue().splitlines() if l.startswith("s ")]
    assert len(rows) == 4  # 2 blocks x 2 seqs
    for r in rows:
        start, size, src_size = int(r[2]), int(r[3]), int(r[5])
        assert start >= 0 and size > 0
        assert start + size <= src_size, r
    g1_rows = [r for r in rows if "g1" in r[1]]
    assert {r[1].rsplit(".", 1)[1] for r in g1_rows} == {"ctgA", "ctgB"}
    assert all(r[4] == "-" for r in g1_rows)

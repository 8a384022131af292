"""Per-tree-node backbone classification (bbAnalyze deep report,
src/bbAnalyze.cpp:1040-1411)."""

import io

import numpy as np

from mauvealigner_tpu.analysis.bb_analyze import (
    add_faux_unique_segments,
    tree_node_analysis,
    write_tree_analysis,
)
from mauvealigner_tpu.analysis.tree import parse_newick


def _row(n, spans):
    r = np.zeros(2 * n, np.int64)
    for s, (a, b) in spans.items():
        r[2 * s], r[2 * s + 1] = a, b
    return r


def test_hop_and_unique_classification():
    tree = parse_newick("((0:1,1:1):1,(2:1,3:1):1);")
    n = 4
    rows = [
        _row(n, {0: (1, 100), 1: (1, 100), 2: (1, 100), 3: (1, 100)}),  # core
        _row(n, {0: (200, 300), 1: (200, 300)}),                        # unique clade {0,1}
        _row(n, {0: (400, 500), 1: (400, 500), 2: (400, 500)}),         # hop one @ root
        _row(n, {0: (600, 700), 2: (600, 700)}),                        # hop two @ root
        _row(n, {0: (800, 805), 1: (800, 805)}),                        # too small: ignored
    ]
    summaries = tree_node_analysis(rows, n, tree)
    by_leaves = {tuple(s.leaf_seqs): s for s in summaries}
    root = by_leaves[(0, 1, 2, 3)]
    assert root.n_hop_one == 1
    assert root.n_hop_two == 1
    assert root.n_unique == 1  # only the core row is present in all 4
    assert root.core_len == 100.0
    clade01 = by_leaves[(0, 1)]
    assert clade01.n_unique == 1  # the {0,1} segment
    assert clade01.unique_len == 101.0
    # pan genome at root counts every (not only large) present segment's avg
    assert root.pan_genome_len > 300

    buf = io.StringIO()
    write_tree_analysis(summaries, buf)
    text = buf.getvalue()
    assert "Alignment tree summary" in text
    assert "hop one" in text and "pan-genome" in text


def test_faux_unique_segments_cover_gaps():
    n = 2
    rows = [_row(n, {0: (11, 40), 1: (1, 30)})]
    out = add_faux_unique_segments(rows, n, [50, 30])
    # genome 0 gets faux [1,10] and [41,50]; genome 1 is fully covered
    faux = [r for r in out[1:]]
    spans0 = sorted((int(r[0]), int(r[1])) for r in faux if r[0] != 0)
    assert spans0 == [(1, 10), (41, 50)]
    assert all(r[2] == 0 for r in faux if r[0] != 0)


def test_trifurcating_and_unary_nodes():
    """Non-binary trees (routine in unrooted Newick) must classify instead
    of crashing or silently zeroing hops."""
    tree = parse_newick("(0:1,1:1,(2:1,3:1):1);")  # trifurcating root
    n = 4
    rows = [
        _row(n, {0: (1, 100), 2: (1, 100)}),  # partial in two children,
                                              # complete in neither subtree
                                              # with >1 leaf -> hop at root
        _row(n, {0: (200, 300), 1: (200, 300), 2: (200, 300), 3: (200, 300)}),
    ]
    summaries = tree_node_analysis(rows, n, tree)
    root = [s for s in summaries if s.leaf_seqs == [0, 1, 2, 3]][0]
    # leaf children are trivially complete when present, so the {0,2}
    # segment is hop_one (single deletion inside the (2,3) clade)
    assert root.n_hop_one == 1
    assert root.n_unique == 1  # the core row

    unary = parse_newick("((0:1):1,1:1);")  # unary internal node
    rows2 = [_row(2, {0: (1, 100), 1: (1, 100)})]
    summaries2 = tree_node_analysis(rows2, 2, unary)  # must not raise
    assert any(s.leaf_seqs == [0, 1] for s in summaries2)


def test_variable_segment_and_alternalog_sites():
    """findVariableSegmentsWithFlankingBB semantics
    (src/bbAnalyze.cpp:426-500): variable sites need one substantial allele
    between consecutive n-way flanks; alternalogs need two."""
    from mauvealigner_tpu.analysis.bb_analyze import (
        find_variable_segments_with_flanking_bb,
    )

    n = 3
    rows = [
        _row(n, {0: (1, 100), 1: (1, 100), 2: (1, 100)}),        # flank A
        _row(n, {0: (200, 300), 1: (200, 300), 2: (200, 300)}),  # flank B
        _row(n, {0: (120, 180)}),                                # allele 1
        _row(n, {1: (120, 180)}),                                # allele 2
        # second site: flank B..C with NO variable content
        _row(n, {0: (320, 400), 1: (320, 400), 2: (320, 400)}),  # flank C
        # third site: flank C..D with one allele (genome 2's gap >= 15 also
        # counts for genomes not covered by any subset row)
        _row(n, {0: (500, 600), 1: (500, 600), 2: (500, 600)}),  # flank D
        _row(n, {0: (430, 470), 1: (430, 470)}),                 # shared allele
    ]
    var = find_variable_segments_with_flanking_bb(rows, n)
    alt = find_variable_segments_with_flanking_bb(rows, n, alternalogs=True)
    # sites: A-B (2 alleles), B-C (gap alleles only: gaps are 19bp >= 15 ->
    # 3 gap alleles), C-D (subset allele + genome-2 gap allele)
    assert len(var) == 3
    assert len(alt) == 3  # A-B: 2 subset; B-C: 3 gap; C-D: 1 subset + 1 gap
    a, b, region = var[0]
    assert region[0] == 101 and region[1] == 199  # genome 0 gap coordinates


def _quadratic_sites(rows, n_seqs, min_bb=None, min_var=None):
    """Straightforward per-pair rescan (the pre-round-3 algorithm): the
    oracle for the bucketed one-pass site detection.  Note a row counts for
    EVERY pair whose gaps contain it (nested gaps under rearrangement)."""
    from mauvealigner_tpu.analysis.bb_analyze import ALTERNALOG_MIN_SIZE

    min_bb = ALTERNALOG_MIN_SIZE if min_bb is None else min_bb
    min_var = ALTERNALOG_MIN_SIZE if min_var is None else min_var
    mat = np.stack(rows).astype(np.int64)
    lefts, rights = np.abs(mat[:, ::2]), np.abs(mat[:, 1::2])
    lo, hi = np.minimum(lefts, rights), np.maximum(lefts, rights)
    present = mat[:, ::2] != 0
    spans = np.where(present, hi - lo + 1, 0)
    nway = present.all(axis=1) & (spans.mean(axis=1) >= min_bb)
    nidx = np.nonzero(nway)[0]
    if len(nidx) < 2:
        return [], []
    order = nidx[np.argsort(lo[nidx, 0], kind="stable")]
    sites, alts = [], []
    for a, b in zip(order[:-1], order[1:]):
        gl, gr = hi[a] + 1, lo[b] - 1
        if (gr < gl - 1).any():
            continue
        alleles = 0
        seen = np.zeros(n_seqs, bool)
        for r in range(mat.shape[0]):
            if nway[r] or not present[r].any():
                continue
            m = present[r]
            if spans[r][m].mean() < min_var:
                continue
            if not ((lo[r][m] >= gl[m]) & (hi[r][m] <= gr[m])).all():
                continue
            if (~seen[m]).any():
                alleles += 1
            seen |= m
        alleles += int(((~seen) & (gr - gl + 1 >= min_var)).sum())
        if alleles > 0:
            region = np.zeros(2 * n_seqs, np.int64)
            ne = gr >= gl
            region[::2] = np.where(ne, gl, 0)
            region[1::2] = np.where(ne, gr, 0)
            sites.append((int(a), int(b), region))
            if alleles > 1:
                alts.append((int(a), int(b), region))
    return sites, alts


def test_bucketed_site_detection_matches_quadratic_reference():
    """The searchsorted-bucketed one-pass site detection must reproduce the
    per-pair rescan oracle on random COLLINEAR well-formed backbones."""
    from mauvealigner_tpu.analysis.bb_analyze import (
        variable_and_alternalog_sites,
    )

    quadratic = _quadratic_sites
    rng = np.random.default_rng(37)
    for trial in range(25):
        n = int(rng.integers(2, 6))
        rows = []
        # well-formed backbone: n-way flanks laid out collinearly with
        # random gaps; subset rows scattered inside/straddling the gaps
        cursor = np.full(n, 1, np.int64)
        for _ in range(int(rng.integers(2, 8))):
            length = int(rng.integers(5, 120))
            start = cursor + rng.integers(0, 80, n)
            row = np.zeros(2 * n, np.int64)
            row[::2], row[1::2] = start, start + length - 1
            rows.append(row)
            cursor = start + length
        span_hi = int(cursor.max() + 100)
        for _ in range(int(rng.integers(0, 14))):
            members = rng.random(n) < 0.6
            if not members.any():
                members[int(rng.integers(0, n))] = True
            a = rng.integers(1, span_hi, n)
            b = a + int(rng.integers(1, 60))
            row = np.zeros(2 * n, np.int64)
            row[::2] = np.where(members, a, 0)
            row[1::2] = np.where(members, b, 0)
            rows.append(row)
        got = variable_and_alternalog_sites(rows, n)
        want = quadratic(rows, n)
        for g_list, w_list in zip(got, want):
            assert len(g_list) == len(w_list), trial
            for (ga, gb, gr_), (wa, wb, wr) in zip(g_list, w_list):
                assert (ga, gb) == (wa, wb) and (gr_ == wr).all(), trial


def test_bucketed_site_detection_matches_quadratic_on_rearrangements():
    """Rearranged backbones make the per-genome gaps of distinct flank
    pairs overlap or NEST; the bucketed detection must still reproduce the
    per-pair rescan (incl. rows counting for several pairs)."""
    from mauvealigner_tpu.analysis.bb_analyze import (
        variable_and_alternalog_sites,
    )

    rng = np.random.default_rng(41)
    for trial in range(40):
        n = int(rng.integers(2, 6))
        n_flanks = int(rng.integers(2, 8))
        rows = []
        # flanks collinear in genome 0, PERMUTED placement in the others:
        # disjoint blocks per genome, but block order differs per genome
        lengths = rng.integers(20, 120, n_flanks)
        placements = np.zeros((n_flanks, n), np.int64)
        for g in range(n):
            order = np.arange(n_flanks) if g == 0 else rng.permutation(n_flanks)
            cur = 1
            for fi in order:
                cur += int(rng.integers(0, 200))
                placements[fi, g] = cur
                cur += int(lengths[fi])
        for fi in range(n_flanks):
            row = np.zeros(2 * n, np.int64)
            row[::2] = placements[fi]
            row[1::2] = placements[fi] + int(lengths[fi]) - 1
            rows.append(row)
        span_hi = int(placements.max() + 300)
        for _ in range(int(rng.integers(0, 16))):
            members = rng.random(n) < 0.6
            if not members.any():
                members[int(rng.integers(0, n))] = True
            a = rng.integers(1, span_hi, n)
            b = a + int(rng.integers(1, 80))
            row = np.zeros(2 * n, np.int64)
            row[::2] = np.where(members, a, 0)
            row[1::2] = np.where(members, b, 0)
            rows.append(row)
        # second parameter set raises min_variable_size so most gaps are
        # below the gap-allele threshold: row membership alone then decides
        # site vs alternalog, which is where bucketing errors surface
        for min_bb, min_var in ((None, None), (20, 45)):
            kw = {} if min_bb is None else {
                "min_bb_size": min_bb, "min_variable_size": min_var,
            }
            qkw = {} if min_bb is None else {"min_bb": min_bb, "min_var": min_var}
            got = variable_and_alternalog_sites(rows, n, **kw)
            want = _quadratic_sites(rows, n, **qkw)
            for g_list, w_list in zip(got, want):
                assert len(g_list) == len(w_list), (
                    trial, min_var, len(g_list), len(w_list),
                )
                for (ga, gb, gr_), (wa, wb, wr) in zip(g_list, w_list):
                    assert (ga, gb) == (wa, wb) and (gr_ == wr).all(), trial


def test_nested_gap_translocation_site_not_misclassified():
    """A translocation nests flank pair (C,D)'s genome-2 gap inside pair
    (A,B)'s: a subset row fitting (A,B) in both its genomes must attach to
    (A,B) even though the innermost-gap pick in genome 2 is (C,D)."""
    from mauvealigner_tpu.analysis.bb_analyze import (
        variable_and_alternalog_sites,
    )

    n = 3
    rows = [
        # flanks: collinear in genomes 0,1; genome 2 translocates F1 late.
        # Genome 1's (F0,F1) gap is 10 bp — too small for a gap allele — so
        # losing the subset row flips the site to a spurious alternalog.
        _row(n, {0: (1, 100), 1: (1, 100), 2: (1, 100)}),            # F0
        _row(n, {0: (201, 300), 1: (111, 210), 2: (1000, 1100)}),    # F1
        _row(n, {0: (401, 500), 1: (401, 500), 2: (200, 300)}),      # F2
        _row(n, {0: (601, 700), 1: (601, 700), 2: (400, 500)}),      # F3
        # subset row in {0, 2}: fits pair (F0,F1) in both member genomes;
        # in genome 2 its interval [310, 360] also sits inside pair
        # (F2,F3)'s nested gap [301, 399]
        _row(n, {0: (110, 160), 2: (310, 360)}),
    ]
    got_sites, got_alts = variable_and_alternalog_sites(rows, n)
    want_sites, want_alts = _quadratic_sites(rows, n)
    for g_list, w_list in ((got_sites, want_sites), (got_alts, want_alts)):
        assert len(g_list) == len(w_list), (len(g_list), len(w_list))
        for (ga, gb, gr_), (wa, wb, wr) in zip(g_list, w_list):
            assert (ga, gb) == (wa, wb) and (gr_ == wr).all()
    # the (F0,F1) site exists, with the subset row counted as its ONE
    # allele: one allele = variable site but NOT an alternalog
    assert any(a == 0 and b == 1 for a, b, _ in got_sites)
    assert not any(a == 0 and b == 1 for a, b, _ in got_alts)


def _feat(kind, a, b, strand=1, name=None):
    from mauvealigner_tpu.genome.sequence import Feature

    quals = {"gene": name} if name else {}
    return Feature(kind, a, b, strand, quals)


def _annotated_genome(length, feats):
    from mauvealigner_tpu.genome.sequence import Genome

    g = Genome.from_string("A" * length)
    g.features = feats
    return g


def test_analyze_variable_segments_report():
    """analyzeVariableSegments semantics (src/bbAnalyze.cpp:808-941):
    variable regions between n-way flanks are classified against every
    genome's own annotations; multi-allelic genes need the region genic in
    EVERY genome; pseudogenes are genic elsewhere but not in the subject."""
    from mauvealigner_tpu.analysis.bb_analyze import analyze_variable_segments

    n = 2
    rows = [
        _row(n, {0: (1, 100), 1: (1, 100)}),      # flank A
        _row(n, {0: (200, 300), 1: (200, 300)}),  # flank B
        _row(n, {0: (120, 180)}),                 # allele in g0 only
        _row(n, {1: (120, 180)}),                 # allele in g1 only
        _row(n, {0: (400, 500), 1: (400, 500)}),  # flank C
    ]
    # both genomes have a CDS spanning the whole A-B gap -> multi-allelic
    # gene; only genome 0 has a CDS over the B-C gap -> apparent pseudogene
    # in genome 1
    g0 = _annotated_genome(600, [
        _feat("CDS", 80, 210, 1, "alleleA"),
        _feat("CDS", 290, 405, 1, "soloGene"),
        _feat("tRNA", 130, 150),
    ])
    g1 = _annotated_genome(600, [_feat("CDS", 80, 210, -1, "alleleA")])

    import io

    buf = io.StringIO()
    regions, per_genome = analyze_variable_segments(
        rows, n, [g0, g1], anno_index=0, alternalogs=False, out=buf,
    )
    text = buf.getvalue()
    assert len(regions) == 2  # A-B and B-C gaps both carry variable content
    assert "There are 2 variable segments sites" in text
    # A-B region [101,199] inside alleleA CDS in both genomes
    assert " There are 1 apparently multi-allelic genes" in text
    # genome 1 lacks soloGene -> the B-C region is an apparent pseudogene
    assert "genome 1 has 1 apparent recent pseudogenes" in text
    # genome 0's tRNA sits inside the A-B region
    assert "genome 0 has 1 variable segments that contain tRNA" in text
    assert "coordinates of multi-allelic genes:" in text
    assert "101\t199\t101\t199" in text


def test_tree_gene_content_distribution():
    """Per-node gene-content distributions (src/bbAnalyze.cpp:1368-1400):
    categories enriched beyond the chi-square threshold appear in the
    node's conserved-distribution table."""
    import io

    from mauvealigner_tpu.analysis.bb_analyze import (
        tree_node_analysis,
        write_tree_analysis,
    )
    from mauvealigner_tpu.analysis.tree import parse_newick

    n = 3
    tree = parse_newick("((0:1,1:1):1,2:1);")
    rows = []
    feats = []
    # 12 conserved segments each covering one CDS of category "met";
    # 12 CDS of category "other" never covered (expected hit rate 0.5 ->
    # both categories deviate strongly -> chi2 above threshold)
    for i in range(12):
        a = 1 + i * 40
        rows.append(_row(n, {0: (a, a + 29), 1: (a, a + 29), 2: (a, a + 29)}))
        feats.append(_feat("CDS", a + 2, a + 20, 1, f"met{i}"))
    for i in range(12):
        a = 2000 + i * 40
        feats.append(_feat("CDS", a, a + 20, 1, f"oth{i}"))
    ref = _annotated_genome(4000, feats)
    cats = {f"met{i}": "metabolism" for i in range(12)}
    cats.update({f"oth{i}": "other" for i in range(12)})
    summaries = tree_node_analysis(rows, n, tree)
    buf = io.StringIO()
    write_tree_analysis(summaries, buf, reference=ref, ref_index=0,
                        categories=cats)
    text = buf.getvalue()
    assert "Conserved gene content distribution" in text
    assert "metabolism" in text
    assert "Avg percent conserved 50" in text

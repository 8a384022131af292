import os

import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.utils import simulate


def test_progressive_pairwise_accuracy(rng):
    anc = simulate.random_genome(rng, 3000)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.001, del_rate=0.001)
    pm = ProgressiveMauve(ProgressiveOptions(seed_weight=11, use_sml_cache=False))
    res = pm.align([anc, der])
    score = score_alignment(truth, res.interval_list, [len(anc), len(der)])
    assert score.sensitivity > 0.9, score.summary()
    assert score.ppv > 0.9, score.summary()


def test_progressive_three_way_with_backbone(rng, tmp_path):
    anc = simulate.random_genome(rng, 2500)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.02)
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.02)
    pm = ProgressiveMauve(ProgressiveOptions(seed_weight=9, use_sml_cache=False))
    res = pm.align([anc, d1, d2])
    assert len(res.lcbs) >= 1
    assert res.guide_tree is not None
    assert sorted(res.guide_tree.leaf_names()) == ["0", "1", "2"]
    # outputs
    prefix = str(tmp_path / "out.xmfa")
    pm.write_outputs(res, prefix)
    assert os.path.exists(prefix)
    if len(res.backbone_rows):
        assert os.path.exists(prefix + ".backbone")
        assert os.path.exists(prefix + ".bbcols")
    # every genome base is accounted for in the final alignment
    for s, g in enumerate(res.interval_list.genomes):
        total = sum(
            int(iv.aln[s].sum())
            for iv in res.interval_list.intervals
            if iv.starts[s] != 0
        )
        assert total == len(g), f"seq {s}: {total} != {len(g)}"


def test_progressive_guide_tree_output(rng, tmp_path):
    anc = simulate.random_genome(rng, 1500)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    tree_file = str(tmp_path / "gt.nwk")
    pm = ProgressiveMauve(
        ProgressiveOptions(seed_weight=9, output_guide_tree=tree_file, use_sml_cache=False)
    )
    pm.align([anc, d1])
    assert os.path.exists(tree_file)
    from mauvealigner_tpu.analysis.tree import parse_newick

    t = parse_newick(open(tree_file).read())
    assert sorted(t.leaf_names()) == ["0", "1"]


def test_progressive_seed_family(rng):
    anc = simulate.random_genome(rng, 1200)
    d1, truth = simulate.evolve(anc, rng, sub_rate=0.01)
    pm = ProgressiveMauve(
        ProgressiveOptions(seed_weight=9, seed_family=True, use_sml_cache=False)
    )
    res = pm.align([anc, d1])
    score = score_alignment(truth, res.interval_list, [len(anc), len(d1)])
    assert score.sensitivity > 0.85


def test_input_guide_tree_label_conventions(rng, tmp_path):
    """External guide trees bind leaves to genomes only via an exact 0-based
    digit label set; 1-based or name labels map to input order, and a leaf
    count mismatch is an error (digit labels passed through unchecked would
    silently bind clades to the wrong genomes)."""
    import os

    import pytest

    anc = simulate.random_genome(rng, 800)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.02)
    genomes = [anc, d1, d2]

    def tree_for(newick):
        path = os.path.join(tmp_path, "in.nwk")
        with open(path, "w") as fh:
            fh.write(newick)
        pm = ProgressiveMauve(
            ProgressiveOptions(input_guide_tree=path, use_sml_cache=False)
        )
        return pm.guide_tree(genomes, None)

    # 0-based labels bind verbatim (topology preserved)
    t = tree_for("((2,1),0);")
    assert t.leaf_names() == ["2", "1", "0"]
    # 1-based labels from an external tool remap to input order
    t = tree_for("((1,2),3);")
    assert sorted(t.leaf_names()) == ["0", "1", "2"]
    # filename labels remap to input order
    t = tree_for("((a.fa,b.fa),c.fa);")
    assert t.leaf_names() == ["0", "1", "2"]
    # leaf count mismatch is loud
    with pytest.raises(ValueError):
        tree_for("(0,1);")

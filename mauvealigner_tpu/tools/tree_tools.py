"""Phylogenetic tree tools (SURVEY.md §2.2 'Phylogenetic tree tools')."""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Set, Tuple

from mauvealigner_tpu.analysis.tree import (
    TreeNode,
    parse_newick,
    reroot_with_outgroup,
    topologies_equal,
    write_newick,
)


def parse_nexus_trees(text: str) -> Tuple[List[Tuple[str, TreeNode]], Dict[str, str]]:
    """Parse trees (and the taxa translate table) from a NEXUS trees block."""
    translate: Dict[str, str] = {}
    trees: List[Tuple[str, TreeNode]] = []
    m = re.search(r"translate(.*?);", text, re.S | re.I)
    if m:
        for entry in m.group(1).split(","):
            toks = entry.split()
            if len(toks) >= 2:
                translate[toks[0]] = toks[1].rstrip(",;")
    for tm in re.finditer(
        r"tree\s+(\S+)\s*(\[[^\]]*\])?\s*=\s*(\[[^\]]*\])?\s*([^;]+);", text, re.I
    ):
        name = tm.group(1)
        newick = tm.group(4).strip() + ";"
        tree = parse_newick(newick)
        if translate:
            for leaf in tree.leaves():
                leaf.name = translate.get(leaf.name, leaf.name)
        trees.append((name, tree))
    return trees, translate


def extract_bci_trees(
    trprobs_text: str, credibility: float = 0.95
) -> List[Tuple[str, float, TreeNode]]:
    """Sample trees above a cumulative Bayesian credibility threshold from a
    MrBayes .trprobs file (extractBCITrees semantics,
    src/extractBCITrees.cpp:197).  Tree comments carry p=... and P=...
    (posterior and cumulative posterior)."""
    out = []
    trees, translate = parse_nexus_trees(trprobs_text)
    probs = re.findall(r"\[\s*&?W?\s*p\s*=\s*([0-9.eE+-]+)[^\]]*\]", trprobs_text)
    cumulative = 0.0
    for i, (name, tree) in enumerate(trees):
        p = float(probs[i]) if i < len(probs) else 0.0
        if cumulative >= credibility - 1e-9:
            break
        cumulative += p
        out.append((name, p, tree))
    return out


def uniquify_trees(trees: Sequence[TreeNode]) -> List[TreeNode]:
    """Deduplicate topologically identical trees (uniquifyTrees semantics,
    src/uniquifyTrees.cpp:195)."""
    unique: List[TreeNode] = []
    for t in trees:
        if not any(topologies_equal(t, u) for u in unique):
            unique.append(t)
    return unique


def root_trees(
    trees: Sequence[TreeNode], outgroup: Set[str]
) -> List[TreeNode]:
    """Outgroup-root every tree (rootTrees semantics, src/rootTrees.cpp:90)."""
    return [reroot_with_outgroup(t, outgroup) for t in trees]


def check_for_lgt(
    gene_tree: TreeNode, group_a: Set[str], group_b: Set[str]
) -> bool:
    """True when the gene tree mixes taxa of group_a inside group_b's clade
    or vice versa — the lateral-transfer topology test of checkForLGT
    (src/checkForLGT.cpp:57-92, generalized from its hard-coded taxon
    groups)."""
    leaves = set(gene_tree.leaf_names())
    ga = group_a & leaves
    gb = group_b & leaves
    if not ga or not gb:
        return False
    for clade in gene_tree.clades():
        c = set(clade)
        # group_a is monophyletic when it appears as a rooted clade OR as
        # the complement of one (unrooted split; rooting is arbitrary)
        if c == ga or (leaves - c) == ga:
            return False  # no LGT signal
    return True

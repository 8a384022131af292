"""Checkpoint/resume subsystem tests (match/offset logs, merge, realign-lcb)."""

import os

import numpy as np
import pytest

from mauvealigner_tpu.core import mln
from mauvealigner_tpu.models import resume
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.seeds import get_seed
from mauvealigner_tpu.tools.cli import main
from mauvealigner_tpu.utils import simulate


@pytest.fixture
def pair(rng):
    anc = simulate.random_genome(rng, 2500)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    return anc, der


def _canon(ml):
    rows = np.concatenate([ml.starts, ml.lengths[:, None]], axis=1)
    return set(map(tuple, rows.tolist()))


def test_partitioned_equals_single_shot(pair):
    anc, der = pair
    seed = get_seed(9, 0)
    aligner = MauveAligner(AlignerOptions(seed_size=9, use_sml_cache=False))
    full = aligner.find_mums([anc, der])
    part = resume.resumable_find_mums([anc, der], seed, n_partitions=4)
    assert _canon(full) == _canon(part)


def test_resume_skips_completed_partitions(pair, tmp_path):
    anc, der = pair
    seed = get_seed(9, 0)
    mlog = str(tmp_path / "m.log")
    olog = str(tmp_path / "o.log")
    full = resume.resumable_find_mums(
        [anc, der], seed, n_partitions=3, match_log=mlog, offset_log=olog
    )
    assert os.path.exists(mlog)
    assert resume.read_offset_log(olog) == [0, 1, 2]
    # restart: all partitions done -> result read straight from the journal
    again = resume.resumable_find_mums(
        [anc, der], seed, n_partitions=3, match_log=mlog, offset_log=olog
    )
    assert _canon(full) == _canon(again)
    # partial resume: only partition 0 recorded
    with open(olog, "w") as fh:
        fh.write("0\n")
    partial = resume.resumable_find_mums(
        [anc, der], seed, n_partitions=3, match_log=mlog, offset_log=olog
    )
    assert _canon(full) == _canon(partial)


def test_merge_match_logs(pair, tmp_path):
    anc, der = pair
    aligner = MauveAligner(AlignerOptions(seed_size=9, use_sml_cache=False))
    ml = aligner.find_mums([anc, der])
    half1 = ml.select(np.arange(len(ml)) % 2 == 0)
    half2 = ml.select(np.arange(len(ml)) % 2 == 1)
    log = str(tmp_path / "other.mln")
    mln.write_match_list(half2, log)
    merged = resume.merge_match_logs(half1, [log])
    assert _canon(merged) == _canon(ml)


def test_realign_lcb_cli(pair, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc, der = pair
    der_inv = simulate.apply_inversion(der, 800, 1600)
    from mauvealigner_tpu.genome import write_fasta

    write_fasta(anc, "a.fa")
    write_fasta(der_inv, "b.fa")
    rc = main(
        [
            "mauveAligner", "a.fa", "b.fa", "--seed-size=9",
            "--output=m.mln", "--output-alignment=one_lcb.xmfa",
            "--realign-lcb=0",
        ]
    )
    assert rc == 0
    from mauvealigner_tpu.core.interval import IntervalList

    ivl = IntervalList.read_xmfa("one_lcb.xmfa")
    assert len(ivl.intervals) == 1


def test_match_input_cli(pair, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc, der = pair
    from mauvealigner_tpu.genome import write_fasta

    write_fasta(anc, "a.fa")
    write_fasta(der, "b.fa")
    assert main(["mauveAligner", "a.fa", "b.fa", "--seed-size=9", "--mums",
                 "--output=m.mln"]) == 0
    assert main(["mauveAligner", "a.fa", "b.fa", "--seed-size=9",
                 "--match-input=m.mln", "--output=m2.mln",
                 "--output-alignment=out.xmfa"]) == 0
    assert os.path.exists("out.xmfa")


def test_match_log_cli(pair, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    anc, der = pair
    from mauvealigner_tpu.genome import write_fasta

    write_fasta(anc, "a.fa")
    write_fasta(der, "b.fa")
    assert main(["mauveAligner", "a.fa", "b.fa", "--seed-size=9", "--mums",
                 "--partitions=3", "--match-log=m.log", "--offset-log=o.log",
                 "--output=m.mln"]) == 0
    assert resume.read_offset_log("o.log") == [0, 1, 2]

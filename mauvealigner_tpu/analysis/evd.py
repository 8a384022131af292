"""Extreme-value-distribution calibration of alignment score significance.

Equivalent of the reference's evd / multiEVD tools (src/evd.cpp:13-66,
src/multiEVD.cpp): simulate score excursions ("local record heights") of
random pairwise alignments under the hoxd scoring scheme and fit a Gumbel
law, used to set island/HSS significance thresholds.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence

import numpy as np

from mauvealigner_tpu.ops import dp


@dataclasses.dataclass
class EvdResult:
    n_excursions: int
    mean_height: float
    max_height: float
    gumbel_lambda: float
    gumbel_mu: float

    def summary(self) -> str:
        return (
            f"excursions: {self.n_excursions}\n"
            f"mean record height: {self.mean_height:.3f}\n"
            f"max record height: {self.max_height:.3f}\n"
            f"lambda: {self.gumbel_lambda:.6f}\n"
            f"mu: {self.gumbel_mu:.3f}\n"
        )


def score_excursions(scores: np.ndarray) -> np.ndarray:
    """Maximal ladder-excursion heights of a per-column score sequence
    (Karlin-Altschul local records; 'local record heights', src/evd.cpp:13)."""
    heights = []
    cur = 0.0
    best = 0.0
    for s in scores:
        cur += s
        if cur <= 0:
            if best > 0:
                heights.append(best)
            cur = 0.0
            best = 0.0
        else:
            best = max(best, cur)
    if best > 0:
        heights.append(best)
    return np.array(heights)


def simulate_evd(
    seq_length: int = 10000,
    n_trials: int = 20,
    gc_content: float = 0.5,
    identity: float = 0.25,
    subst: np.ndarray = dp.HOXD70,
    seed: int = 37,
) -> EvdResult:
    """Simulate unrelated sequence pairs, score column-wise with the hoxd
    matrix, and collect excursion heights."""
    rng = np.random.default_rng(seed)
    p = np.array(
        [(1 - gc_content) / 2, gc_content / 2, gc_content / 2, (1 - gc_content) / 2]
    )
    heights: List[float] = []
    for _ in range(n_trials):
        a = rng.choice(4, size=seq_length, p=p)
        b = rng.choice(4, size=seq_length, p=p)
        scores = subst[a, b].astype(float)
        heights.extend(score_excursions(scores).tolist())
    h = np.array(heights)
    if len(h) == 0:
        return EvdResult(0, 0.0, 0.0, 0.0, 0.0)
    # Gumbel moment fit: var = pi^2/(6 lambda^2); mean = mu + gamma/lambda
    lam = math.pi / math.sqrt(6 * max(h.var(), 1e-9))
    mu = float(h.mean()) - 0.5772156649 / lam
    return EvdResult(len(h), float(h.mean()), float(h.max()), lam, mu)


def merge_evd_results(results: Sequence[EvdResult]) -> EvdResult:
    """Aggregate per-job EVD runs (multiEVD over alignjob directories,
    src/multiEVD.cpp:104-105)."""
    results = [r for r in results if r.n_excursions > 0]
    if not results:
        return EvdResult(0, 0.0, 0.0, 0.0, 0.0)
    n = sum(r.n_excursions for r in results)
    mean = sum(r.mean_height * r.n_excursions for r in results) / n
    mx = max(r.max_height for r in results)
    lam = sum(r.gumbel_lambda * r.n_excursions for r in results) / n
    mu = sum(r.gumbel_mu * r.n_excursions for r in results) / n
    return EvdResult(n, mean, mx, lam, mu)


def significance_threshold(result: EvdResult, p_value: float = 0.01) -> float:
    """Score above which an excursion is significant at the given p-value."""
    if result.gumbel_lambda <= 0:
        return float("inf")
    return result.gumbel_mu - math.log(-math.log(1 - p_value)) / result.gumbel_lambda

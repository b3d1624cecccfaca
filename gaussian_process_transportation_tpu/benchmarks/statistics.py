"""Statistical method ranking (parity with
``example/comparisons/multi_reference_frames/statistical_tool.py:41-62``):
pairwise one-sided Mann-Whitney U tests; a method's rank improves by one for
every competitor it beats at p < alpha, then ranks are compacted."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy import stats


def mann_whitney_ranking(
    samples: Dict[str, np.ndarray], alpha: float = 0.05
) -> List[Tuple[str, int]]:
    """samples: method name → metric samples (lower is better).
    Returns [(name, rank)] sorted by rank (1 = best)."""
    names = list(samples)
    raw_rank = {n: len(names) for n in names}
    for a in names:
        for b in names:
            if a == b:
                continue
            xa = np.asarray(samples[a])
            xb = np.asarray(samples[b])
            xa = xa[~np.isnan(xa)]
            xb = xb[~np.isnan(xb)]
            p = stats.mannwhitneyu(xa, xb, alternative="less")[1]
            if p < alpha:
                raw_rank[a] -= 1
    # compact ranks to 1..k preserving ties
    uniq = sorted(set(raw_rank.values()))
    remap = {v: i + 1 for i, v in enumerate(uniq)}
    ranked = [(n, remap[raw_rank[n]]) for n in names]
    return sorted(ranked, key=lambda t: t[1])


def best_method(samples: Dict[str, np.ndarray], alpha: float = 0.05) -> str:
    return mann_whitney_ranking(samples, alpha)[0][0]

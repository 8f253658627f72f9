"""Sequential hyperparameter search.

Counterpart of the reference's test_tube multi-trial harness
(``tsl/utils/experiment.py:54-83`` + ``opt_list`` tunables): sample
trial configurations from per-flag option lists (grid or random),
run them sequentially, swallow per-trial runtime errors (``:63-73``),
and report the best trial by a monitored metric.
"""
from __future__ import annotations

import itertools
import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from sgp_tpu.utils.logging import logger


def grid_trials(space: Dict[str, Sequence]) -> List[Dict]:
    keys = list(space)
    return [dict(zip(keys, vals))
            for vals in itertools.product(*(space[k] for k in keys))]


def random_trials(space: Dict[str, Sequence], n_trials: int,
                  seed: int = 0) -> List[Dict]:
    rng = np.random.default_rng(seed)
    return [{k: v[rng.integers(len(v))] for k, v in space.items()}
            for _ in range(n_trials)]


def run_search(run_fn: Callable[[Dict], Dict],
               base_config: Dict,
               space: Dict[str, Sequence],
               mode: str = "random",
               n_trials: int = 10,
               monitor: str = "test_mae",
               minimize: bool = True,
               seed: int = 0,
               out_path: Optional[str] = None) -> Dict:
    """Run trials of ``run_fn(config) -> metrics dict``; returns
    ``{"best_config", "best_metrics", "trials"}``."""
    trials = (grid_trials(space) if mode == "grid"
              else random_trials(space, n_trials, seed))
    results = []
    best = None
    sign = 1.0 if minimize else -1.0
    for i, overrides in enumerate(trials):
        cfg = {**base_config, **overrides}
        logger.info(f"trial {i + 1}/{len(trials)}: {overrides}")
        try:
            metrics = run_fn(cfg)
        except RuntimeError as e:  # reference swallows per-trial errors
            logger.warning(f"trial {i} failed: {e}")
            results.append({"config": overrides, "error": str(e)})
            continue
        results.append({"config": overrides, "metrics": metrics})
        score = sign * metrics[monitor]
        if best is None or score < best[0]:
            best = (score, overrides, metrics)
    out = {"best_config": best[1] if best else None,
           "best_metrics": best[2] if best else None,
           "trials": results}
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as fp:
            json.dump(out, fp, indent=2, default=float)
    return out

"""Train-state checkpointing for restartable training.

SURVEY.md §5.3/5.4: the reference recovers only best weights via
Lightning's ModelCheckpoint; the TPU build adds *restartability* —
params + optimizer state + sampler RNG + progress serialized together,
so a killed run resumes deterministically (designed for restart, not
in-flight elasticity).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def save_train_state(path: str, params: Any, opt_state: Any = None,
                     rng=None, extra: Optional[Dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = {
        "params": flax.serialization.to_bytes(params),
        "opt_state": None if opt_state is None
        else flax.serialization.to_bytes(opt_state),
        "rng": None if rng is None else np.asarray(rng),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as fp:
        pickle.dump(state, fp)
    os.replace(tmp, path)  # atomic — a crash mid-write keeps the old ckpt


def load_train_state(path: str, params_template: Any,
                     opt_state_template: Any = None):
    with open(path, "rb") as fp:
        state = pickle.load(fp)
    params = flax.serialization.from_bytes(params_template,
                                           state["params"])
    opt_state = None
    if state["opt_state"] is not None and opt_state_template is not None:
        opt_state = flax.serialization.from_bytes(opt_state_template,
                                                  state["opt_state"])
    rng = None if state["rng"] is None else jax.numpy.asarray(state["rng"])
    return params, opt_state, rng, state["extra"]

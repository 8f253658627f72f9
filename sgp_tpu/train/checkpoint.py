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
import threading
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def model_config(model) -> Dict[str, str]:
    """Hyperparameter fingerprint of a flax module (its dataclass
    fields, repr'd) — stored in checkpoints and asserted on reload, the
    parity of the reference's hparam-match check when loading a model
    from a checkpoint (``tsl/predictors/base_predictor.py:89-96``)."""
    import dataclasses
    out = {"__class__": type(model).__name__}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        out[f.name] = repr(getattr(model, f.name))
    return out


def check_model_config(stored: Dict[str, str], model):
    """Raise if the checkpoint's model config mismatches the live model."""
    live = model_config(model)
    mismatched = {k: (stored.get(k), live.get(k))
                  for k in set(stored) | set(live)
                  if stored.get(k) != live.get(k)}
    if mismatched:
        raise ValueError(
            "checkpoint model config mismatch (stored vs live): "
            f"{mismatched}")


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


class AsyncCheckpointer:
    """Background checkpoint writer.

    jax arrays are immutable, so a checkpoint's device->host fetch and
    serialization can run on a worker thread while the step loop keeps
    training on NEW buffers — no copy or synchronization is needed
    beyond holding the references. This matters here because the
    device link is a ~MB/s tunnel: the flagship decoder state measured
    92 s to save synchronously (bench aux section), which would stall
    training for the entire transfer at every ``--checkpoint-every``.

    At most one save is in flight: a new :meth:`save` joins the
    previous one first (a writer slower than the save cadence degrades
    to the synchronous behavior, never to a queue). A writer exception
    is re-raised at the next :meth:`save`/:meth:`wait` so failures
    cannot pass silently. Call :meth:`wait` before reading the file or
    exiting."""

    def __init__(self, save_fn=None):
        self._save_fn = save_fn or save_run_state
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, *args, **kwargs):
        self.wait()

        def run():
            try:
                self._save_fn(*args, **kwargs)
            except BaseException as e:   # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def save_run_state(path: str, model, params, opt_state, rng,
                   epoch: int, best_loss: float, best_params,
                   elapsed_s: float = 0.0,
                   train_config: Optional[Dict] = None):
    """One ATOMIC file for a restartable runner epoch: current
    params/opt/RNG plus the best-so-far params and progress — a kill
    can never leave 'current' and 'best' out of sync (they live in the
    same ``os.replace``). ``train_config`` records the training
    hyperparameters (lr, batch size, ...) so a resume under different
    training settings fails loudly instead of silently breaking the
    exact-run semantics."""
    save_train_state(path, params, opt_state, rng, extra={
        "epoch": epoch, "best_loss": float(best_loss),
        "model_config": model_config(model),
        "train_config": train_config or {},
        "best_params": flax.serialization.to_bytes(best_params),
        "elapsed_s": float(elapsed_s)})


def restore_run_state(path: str, model, params_template,
                      opt_state_template,
                      train_config: Optional[Dict] = None):
    """Counterpart of :func:`save_run_state`. Returns ``(params,
    opt_state, rng, start_epoch, best_loss, best_params, elapsed_s)``;
    raises on a model- or train-config mismatch."""
    params, opt_state, rng, extra = load_train_state(
        path, params_template, opt_state_template)
    check_model_config(extra["model_config"], model)
    stored_tc = extra.get("train_config", {})
    if train_config:
        mismatched = {k: (stored_tc.get(k), v)
                      for k, v in train_config.items()
                      if stored_tc.get(k) != v}
        if mismatched:
            raise ValueError(
                "checkpoint train config mismatch (stored vs live): "
                f"{mismatched}")
    best_params = flax.serialization.from_bytes(params_template,
                                                extra["best_params"])
    return (params, opt_state, rng, extra["epoch"] + 1,
            extra["best_loss"], best_params, extra.get("elapsed_s", 0.0))


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

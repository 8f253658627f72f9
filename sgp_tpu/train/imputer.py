"""Imputation training engine.

Counterpart of ``tsl/imputers/imputer.py:11-229`` (unused by the
reference experiments, kept for capability parity): trains an imputation
model (e.g. :class:`~sgp_tpu.models.grin.GRINModel`) with
*whiten-masked* batches — a random fraction of observed points is hidden
at train time and the loss computed on those plus the synthetic eval
mask; window edges can be trimmed from the loss
(``prediction_loss_weight`` / ``warm_up`` semantics).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from sgp_tpu.train.metrics import _abs_err, _masked_reduce


def make_imputer_train_step(model, optimizer, batch_to_call: Callable,
                            whiten_prob: float = 0.05,
                            prediction_loss_weight: float = 1.0,
                            warm_up: int = 0):
    """Build ``step(params, opt_state, batch, rng)``.

    The model is expected to return
    ``(imputation, (imp_f, pred_f), (imp_b, pred_b))`` (GRIN contract);
    the loss sums the merged imputation error and the per-direction
    stage errors weighted by ``prediction_loss_weight``
    (``imputer.py`` training_step semantics).
    """

    def loss_fn(params, batch, rng):
        x, mask = batch["x"], batch["mask"].astype(bool)
        # whitening: hide a random subset of observed points
        keep = jax.random.uniform(rng, mask.shape) > whiten_prob
        train_mask = mask & keep
        target_mask = mask & ~keep
        batch_in = dict(batch)
        batch_in["x"] = jnp.where(train_mask, x, 0.0)
        batch_in["mask"] = train_mask
        args, kwargs = batch_to_call(batch_in, True)
        merged, (imp_f, pred_f), (imp_b, pred_b) = model.apply(
            params, *args, **kwargs)
        # ground truth: ImputationDataset.gather_batch's ``y`` (raw
        # window; at eval_mask points x is zeroed, y holds the value)
        y = batch.get("y", x)

        def trimmed(v):
            return v[:, warm_up:] if warm_up else v

        lm = trimmed(target_mask | (~mask & batch.get(
            "eval_mask", jnp.zeros_like(mask)).astype(bool)))
        total = 0.0
        for pred, w in ((merged, 1.0), (imp_f, prediction_loss_weight),
                        (imp_b, prediction_loss_weight),
                        (pred_f, prediction_loss_weight),
                        (pred_b, prediction_loss_weight)):
            v, n = _masked_reduce(_abs_err, trimmed(pred), trimmed(y), lm)
            total = total + w * v / jnp.maximum(n, 1.0)
        return total

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

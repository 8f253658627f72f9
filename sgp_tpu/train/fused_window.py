"""Fused full-graph windowed training.

The windowed (traffic) counterpart of ``sgp_tpu/train/iid.py``: window
sampling, window/horizon gather from device-resident arrays, optional
support propagation, forward, masked loss, backward and Adam run as ONE
jitted program, with a multi-step ``lax.scan`` variant — removing the
per-batch host dispatch that bounds the loader-based path on a
high-latency device link.

Sampling semantics: items are drawn uniformly with replacement from the
training items (the reference shuffles without replacement; with
``batches_epoch``-limited epochs the two are statistically equivalent —
documented divergence).
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import optax

from sgp_tpu.data.scalers import ScalerParams
from sgp_tpu.train.metrics import _METRIC_FNS, _masked_reduce


def make_fused_window_step(model, optimizer,
                           x_full: jnp.ndarray,       # [T, N, Cin]
                           target: jnp.ndarray,       # [T, N, C]
                           mask: jnp.ndarray,         # [T, N, C]
                           item_starts: jnp.ndarray,  # [S]
                           window_offsets: jnp.ndarray,   # [W]
                           horizon_offsets: jnp.ndarray,  # [H]
                           scaler: ScalerParams,
                           u: Optional[jnp.ndarray] = None,  # [T, F]
                           support_ops: Optional[List] = None,
                           batch_size: int = 64,
                           loss: str = "mae",
                           scale_target: bool = False,
                           steps_per_call: int = 1) -> Callable:
    """Build ``step(params, opt_state, rng)``; with ``steps_per_call>1``
    the returned callable scans that many optimizer steps per dispatch."""
    loss_pt = _METRIC_FNS[loss]
    data = (x_full, target, mask, item_starts, window_offsets,
            horizon_offsets) + ((u,) if u is not None else ())
    has_u = u is not None

    def sample_and_loss(params, rng, data):
        xf, tgt, msk, starts, w_off, h_off = data[:6]
        rng_i, rng_d = jax.random.split(rng)
        items = jax.random.choice(rng_i, starts, (batch_size,))
        w_steps = items[:, None] + w_off[None, :]
        h_steps = items[:, None] + h_off[None, :]
        x = xf[w_steps]                      # [B, W, N, Cin]
        if support_ops is not None:
            parts = [x]
            for op in support_ops:
                parts.append(op @ x)
            x = jnp.concatenate(parts, -1)
        y = tgt[h_steps]
        m = msk[h_steps]
        kwargs = {}
        if has_u:
            kwargs["u"] = data[6][w_steps]   # [B, W, F]
        y_hat = model.apply(params, x, training=True,
                            rngs={"dropout": rng_d}, **kwargs)
        if scale_target:
            y_ref = scaler.transform(y)
        else:
            y_hat = scaler.inverse_transform(y_hat)
            y_ref = y
        v, cnt = _masked_reduce(loss_pt, y_hat, y_ref, m)
        return v / jnp.maximum(cnt, 1.0)

    @jax.jit
    def _single(params, opt_state, rng, data):
        loss_val, grads = jax.value_and_grad(sample_and_loss)(
            params, rng, data)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    if steps_per_call <= 1:
        def step(params, opt_state, rng):
            return _single(params, opt_state, rng, data)
        return step

    @jax.jit
    def _multi(params, opt_state, rng, data):
        def body(carry, key):
            p, s = carry
            loss_val, grads = jax.value_and_grad(sample_and_loss)(
                p, key, data)
            updates, s = optimizer.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), loss_val
        keys = jax.random.split(rng, steps_per_call)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return params, opt_state, losses.mean()

    def step(params, opt_state, rng):
        return _multi(params, opt_state, rng, data)

    return step

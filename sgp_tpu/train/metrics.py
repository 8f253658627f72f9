"""Masked forecasting metrics.

Functional counterpart of the reference's torchmetrics stack
(``tsl/nn/metrics/metric_base.py:32-121`` + ``metrics.py``): each metric
accumulates masked ``(sum, count)`` state across batches; the states are
plain pytrees so they ``psum`` across a device mesh for free (the
multi-chip reduction torchmetrics would do via DDP). ``at=k`` restricts
a metric to horizon step ``k`` (e.g. ``mae_at_15`` = step 2 on 5-min
data, ``run_traffic_sgp.py:244-249``).

Also provides one-shot numpy twins (``tsl/utils/numpy_metrics.py``) used
by the closed-form path.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


# -- pointwise error functions --------------------------------------------

def _abs_err(y_hat, y):
    return jnp.abs(y_hat - y)


def _sq_err(y_hat, y):
    return (y_hat - y) ** 2


def _ape(y_hat, y):
    return jnp.abs((y_hat - y) / y)


_METRIC_FNS: Dict[str, Callable] = {
    "mae": _abs_err, "mse": _sq_err, "mape": _ape,
}


def _masked_reduce(fn, y_hat, y, mask):
    val = fn(y_hat, y)
    if mask is None:
        return val.sum(), jnp.asarray(val.size, jnp.float32)
    mask = mask.astype(bool)
    val = jnp.where(mask, val, 0.0)
    return val.sum(), mask.sum().astype(jnp.float32)


# -- one-shot metrics (jnp or numpy inputs) --------------------------------

def masked_mae(y_hat, y, mask=None):
    v, n = _masked_reduce(_abs_err, jnp.asarray(y_hat), jnp.asarray(y), mask)
    return v / jnp.maximum(n, 1.0)


def masked_mse(y_hat, y, mask=None):
    v, n = _masked_reduce(_sq_err, jnp.asarray(y_hat), jnp.asarray(y), mask)
    return v / jnp.maximum(n, 1.0)


def masked_rmse(y_hat, y, mask=None):
    return jnp.sqrt(masked_mse(y_hat, y, mask))


def masked_mape(y_hat, y, mask=None):
    v, n = _masked_reduce(_ape, jnp.asarray(y_hat), jnp.asarray(y), mask)
    return v / jnp.maximum(n, 1.0)


def masked_mre(y_hat, y, mask=None):
    """sum |err| / sum |y| (``metrics.py:104-164``)."""
    y_hat, y = jnp.asarray(y_hat), jnp.asarray(y)
    v, _ = _masked_reduce(_abs_err, y_hat, y, mask)
    tot, _ = _masked_reduce(lambda a, b: jnp.abs(b), y_hat, y, mask)
    return v / jnp.maximum(tot, 1e-12)


# -- accumulating collection ----------------------------------------------

@dataclasses.dataclass(frozen=True)
class MetricSpec:
    kind: str                 # mae | mse | mape | mre
    at: Optional[int] = None  # horizon step restriction


class MaskedMetrics:
    """A named collection of accumulating masked metrics.

    State is a dict name -> (value_sum, denom_sum) of scalars; ``update``
    is jit-friendly (pure function of state + batch tensors).
    """

    def __init__(self, specs: Dict[str, MetricSpec]):
        self.specs = specs

    @property
    def names(self):
        return tuple(self.specs)

    @staticmethod
    def forecasting(horizon_at: Dict[str, int] = None) -> "MaskedMetrics":
        """The standard suite: mae/mse/mape (+ ``mae_at_<label>``)."""
        specs = {"mae": MetricSpec("mae"), "mse": MetricSpec("mse"),
                 "mape": MetricSpec("mape")}
        for label, step in (horizon_at or {}).items():
            specs[f"mae_at_{label}"] = MetricSpec("mae", at=step)
        return MaskedMetrics(specs)

    def init(self) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
        return {name: (jnp.zeros(()), jnp.zeros(()))
                for name in self.specs}

    def update(self, state, y_hat, y, mask=None):
        new = dict(state)
        for name, spec in self.specs.items():
            yh, yy, mm = y_hat, y, mask
            if spec.at is not None:
                yh = y_hat[:, spec.at:spec.at + 1]
                yy = y[:, spec.at:spec.at + 1]
                mm = None if mask is None else mask[:, spec.at:spec.at + 1]
            if spec.kind == "mre":
                v, _ = _masked_reduce(_abs_err, yh, yy, mm)
                n, _ = _masked_reduce(lambda a, b: jnp.abs(b), yh, yy, mm)
            else:
                v, n = _masked_reduce(_METRIC_FNS[spec.kind], yh, yy, mm)
            pv, pn = state[name]
            new[name] = (pv + v, pn + n)
        return new

    def compute(self, state) -> Dict[str, float]:
        return {name: float(v) / max(float(n), 1e-12)
                for name, (v, n) in state.items()}


# -- loss extras (``tsl/nn/metrics/pinball_loss.py``, ``multi_loss.py``,
#    ``metric_wrappers.py``) ------------------------------------------------

def pinball_loss(y_hat, y, q: float = 0.5):
    """Quantile (pinball) loss (``pinball_loss.py:6-19``)."""
    err = y - y_hat
    return jnp.maximum(q * err, (q - 1.0) * err)


def masked_pinball(y_hat, y, mask=None, q: float = 0.5):
    v, n = _masked_reduce(lambda a, b: pinball_loss(a, b, q),
                          jnp.asarray(y_hat), jnp.asarray(y), mask)
    return v / jnp.maximum(n, 1.0)


def multi_loss(losses, weights=None):
    """Weighted combination of loss callables
    (``multi_loss.py:5``): returns ``fn(y_hat, y, mask)``."""
    if weights is None:
        weights = [1.0] * len(losses)

    def fn(y_hat, y, mask=None):
        return sum(w * l(y_hat, y, mask)
                   for w, l in zip(weights, losses))
    return fn


def metric_at_steps(metric_fn, steps):
    """Restrict a metric to specific horizon steps
    (``metric_wrappers.py`` split-by-step)."""
    steps = jnp.asarray(steps)

    def fn(y_hat, y, mask=None):
        y_hat = jnp.take(y_hat, steps, axis=1)
        y = jnp.take(y, steps, axis=1)
        mask = None if mask is None else jnp.take(mask, steps, axis=1)
        return metric_fn(y_hat, y, mask)
    return fn


def metric_on_channels(metric_fn, channels):
    """Restrict a metric to channel subset (``metric_wrappers.py``)."""
    channels = jnp.asarray(channels)

    def fn(y_hat, y, mask=None):
        y_hat = jnp.take(y_hat, channels, axis=-1)
        y = jnp.take(y, channels, axis=-1)
        mask = None if mask is None else jnp.take(mask, channels, axis=-1)
        return metric_fn(y_hat, y, mask)
    return fn


# -- numpy twins (closed-form path, ``tsl/utils/numpy_metrics.py``) --------

def numpy_masked_mae(y_hat, y, mask=None):
    return float(masked_mae(np.asarray(y_hat), np.asarray(y),
                            None if mask is None else np.asarray(mask)))


def numpy_masked_rmse(y_hat, y, mask=None):
    return float(masked_rmse(np.asarray(y_hat), np.asarray(y),
                             None if mask is None else np.asarray(mask)))


def numpy_masked_mre(y_hat, y, mask=None):
    return float(masked_mre(np.asarray(y_hat), np.asarray(y),
                            None if mask is None else np.asarray(mask)))

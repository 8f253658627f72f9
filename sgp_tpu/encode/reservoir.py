"""Randomized echo-state reservoir over time.

TPU-native re-design of the reference ESN (``lib/nn/reservoir/
reservoir.py:18-186``): the per-step update

    h' = (1 - alpha) * h + alpha * act(W_ih x + b_ih + W_hh h)

runs as a single ``jax.lax.scan`` over time, jitted once — the torch
version's Python loop over 34k steps (``reservoir.py:170-180``) becomes
one XLA while-loop with fused GEMM+GEMM+act per step. Layers are stacked
(layer i feeds layer i+1's input); per-step states of all layers are
concatenated channel-wise, matching the reference output ``[t, n, L*H]``.

Initialization reproduces the reference's *construction* (not its torch
RNG bit-stream): U(-1,1) scaled input/bias weights, recurrent U(-1,1)
with a random density mask, exact spectral-radius rescale on host
(``reservoir.py:54-75``). ``Reservoir.from_arrays`` imports externally
generated (e.g. torch) weights for activation-allclose parity testing.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sgp_tpu.ops.linalg import spectral_radius_exact


def self_normalizing_activation(x: jnp.ndarray, r: float = 1.0):
    """``r * x / ||x||_2`` along the channel axis (``lib/utils.py:50-51``)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return r * x / jnp.maximum(norm, 1e-12)


_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "identity": lambda x: x,
    "self_norm": self_normalizing_activation,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReservoirLayerParams:
    w_ih: jnp.ndarray            # [H, F_in]
    w_hh: jnp.ndarray            # [H, H]
    b_ih: Optional[jnp.ndarray]  # [H] or None
    alpha: float


def _init_layer(rng: np.random.Generator, input_size: int, hidden_size: int,
                spectral_radius: float, leaking_rate: float,
                density: float, in_scaling: float, bias: bool,
                bias_scale: float) -> ReservoirLayerParams:
    w_ih = rng.uniform(-1, 1, (hidden_size, input_size)) * in_scaling
    b_ih = rng.uniform(-1, 1, hidden_size) * bias_scale if bias else None
    w_hh = rng.uniform(-1, 1, (hidden_size, hidden_size))
    if density < 1:
        n_units = hidden_size * hidden_size
        mask = np.ones(n_units)
        drop = rng.permutation(n_units)[:int(n_units * (1 - density))]
        mask[drop] = 0.0
        w_hh = w_hh * mask.reshape(hidden_size, hidden_size)
    w_hh = w_hh * (spectral_radius / spectral_radius_exact(w_hh))
    return ReservoirLayerParams(
        jnp.asarray(w_ih, jnp.float32), jnp.asarray(w_hh, jnp.float32),
        None if b_ih is None else jnp.asarray(b_ih, jnp.float32),
        float(leaking_rate))


class Reservoir:
    """Stacked frozen echo-state layers with optional alpha decay
    (``reservoir.py:84-125``: alpha decremented by 0.1 per layer,
    clipped to [0.1, 1])."""

    def __init__(self, input_size: int, hidden_size: int,
                 input_scaling: float = 1.0, num_layers: int = 1,
                 leaking_rate: float = 0.9, spectral_radius: float = 0.9,
                 density: float = 0.9, activation: str = "tanh",
                 bias: bool = True, alpha_decay: bool = False,
                 seed: int = 0):
        assert activation in _ACTIVATIONS, activation
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.activation = activation
        rng = np.random.default_rng(seed)
        layers: List[ReservoirLayerParams] = []
        alpha = leaking_rate
        for i in range(num_layers):
            layers.append(_init_layer(
                rng, input_size if i == 0 else hidden_size, hidden_size,
                spectral_radius, alpha, density, input_scaling,
                bias, 1.0))
            if alpha_decay:
                alpha = float(np.clip(alpha - 0.1, 0.1, 1.0))
        self.layers = layers

    @classmethod
    def from_arrays(cls, weights: Sequence[dict], activation: str = "tanh"
                    ) -> "Reservoir":
        """Import external (e.g. torch-exported) weights: a sequence of
        dicts with keys ``w_ih [H, F]``, ``w_hh [H, H]``, optional
        ``b_ih [H]`` and ``alpha``."""
        obj = cls.__new__(cls)
        obj.activation = activation
        obj.layers = [ReservoirLayerParams(
            jnp.asarray(w["w_ih"], jnp.float32),
            jnp.asarray(w["w_hh"], jnp.float32),
            None if w.get("b_ih") is None
            else jnp.asarray(w["b_ih"], jnp.float32),
            float(w.get("alpha", 0.9))) for w in weights]
        obj.num_layers = len(obj.layers)
        obj.hidden_size = obj.layers[0].w_hh.shape[0]
        obj.input_size = obj.layers[0].w_ih.shape[1]
        return obj

    @property
    def output_size(self) -> int:
        return self.num_layers * self.hidden_size

    def __call__(self, x: jnp.ndarray, h0=None,
                 return_last_state: bool = False,
                 out_dtype=None, with_state: bool = False) -> jnp.ndarray:
        """Run the scan. ``x [T, N, F]`` (or ``[T, B, F]`` — any flat
        batch axis) -> ``[T, N, L*H]``; ``return_last_state`` gives only
        the final step ``[N, L*H]``. ``out_dtype`` (e.g. bf16) casts each
        step's output INSIDE the scan, so the f32 state history is never
        materialized (halves the output HBM footprint). ``with_state``
        returns ``(out, last_h)`` where ``last_h`` is the per-layer state
        list — feed it back as ``h0`` to continue the scan chunk by chunk
        (streaming encode)."""
        return reservoir_scan(tuple(self.layers), self.activation, x, h0,
                              return_last_state, out_dtype=out_dtype,
                              with_state=with_state)

    def step(self, h: Sequence[jnp.ndarray], x_t: jnp.ndarray):
        """Single-step update (streaming / incremental encoding)."""
        return _reservoir_step(tuple(self.layers),
                               _ACTIVATIONS[self.activation], list(h), x_t)


def _reservoir_step(layers, act, h, x_t):
    new_h = []
    inp = x_t
    for i, p in enumerate(layers):
        pre = inp @ p.w_ih.T + h[i] @ p.w_hh.T
        if p.b_ih is not None:
            pre = pre + p.b_ih
        hi = (1.0 - p.alpha) * h[i] + p.alpha * act(pre)
        new_h.append(hi)
        inp = hi
    return new_h


@functools.partial(jax.jit,
                   static_argnames=("activation", "return_last_state",
                                    "out_dtype", "with_state"))
def reservoir_scan(layers, activation: str, x, h0=None,
                   return_last_state: bool = False, out_dtype=None,
                   with_state: bool = False):
    act = _ACTIVATIONS[activation]
    batch_shape = x.shape[1:-1]
    x2 = x.reshape(x.shape[0], -1, x.shape[-1])  # [T, B, F]
    if h0 is None:
        h0 = [jnp.zeros((x2.shape[1], p.w_hh.shape[0]), x.dtype)
              for p in layers]

    def step(h, x_t):
        new_h = _reservoir_step(layers, act, h, x_t)
        out_t = jnp.concatenate(new_h, axis=-1)
        if out_dtype is not None:
            out_t = out_t.astype(out_dtype)
        return new_h, out_t

    last_h, out = jax.lax.scan(step, list(h0), x2)
    if return_last_state:
        return jnp.concatenate(last_h, -1).reshape(batch_shape + (-1,))
    out = out.reshape((x.shape[0],) + batch_shape + (out.shape[-1],))
    if with_state:
        return out, last_h
    return out

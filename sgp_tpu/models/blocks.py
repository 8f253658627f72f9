"""Shared trainable NN blocks (flax.linen).

Counterparts of the reference block zoo used by the experiment models:
``tsl/nn/base/dense.py``, ``blocks/encoders/mlp.py`` (MLP/ResidualMLP),
``blocks/decoders/linear_readout.py`` / ``mlp_decoder.py``,
``base/embedding.py`` (StaticGraphEmbedding); plus the SGP decoder's
grouped 1x1 Conv1d (``lib/nn/models/sgp_model.py:41-52``) re-expressed
as a block-diagonal einsum (``GroupedLinear``) — the TPU-idiomatic form
of a feature-grouped projection.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

_ACT = {
    "relu": nn.relu, "silu": nn.silu, "elu": nn.elu, "tanh": jnp.tanh,
    "leaky_relu": nn.leaky_relu, "sigmoid": nn.sigmoid, "gelu": nn.gelu,
    "softplus": nn.softplus, "identity": lambda x: x, "linear": lambda x: x,
}


def get_activation(name: str) -> Callable:
    return _ACT[name]


def maybe_cat_exog(x, u):
    """Concat exogenous onto x along channels, broadcasting missing axes
    (``tsl/nn/utils/utils.py`` ``maybe_cat_exog``)."""
    if u is None:
        return x
    if u.ndim < x.ndim:  # u [..., F] global vs x [..., N, C]
        u = jnp.broadcast_to(u[..., None, :],
                             x.shape[:-1] + (u.shape[-1],))
    return jnp.concatenate([x, u], axis=-1)


class Dense(nn.Module):
    """Linear -> activation -> dropout (``tsl/nn/base/dense.py:6-25``)."""
    output_size: int
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = _ACT[self.activation](nn.Dense(self.output_size)(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class GroupedLinear(nn.Module):
    """Feature-grouped projection: input channels split into ``groups``
    equal blocks, each with its own weight — equivalent to the
    reference's ``nn.Conv1d(kernel_size=1, groups=order)``
    (``sgp_model.py:45-48``), lowered to one batched matmul on the MXU."""
    output_size: int
    groups: int

    @nn.compact
    def __call__(self, x):
        g = self.groups
        c_in, c_out = x.shape[-1], self.output_size
        assert c_in % g == 0 and c_out % g == 0, \
            f"channels in {c_in} / out {c_out} not divisible by {g} groups"
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (g, c_in // g, c_out // g))
        b = self.param("bias", nn.initializers.zeros, (c_out,))
        xg = x.reshape(x.shape[:-1] + (g, c_in // g))
        out = jnp.einsum("...gi,gio->...go", xg, w)
        return out.reshape(x.shape[:-1] + (c_out,)) + b


class MLP(nn.Module):
    """Stacked Dense layers + optional readout
    (``blocks/encoders/mlp.py:7-51``)."""
    hidden_size: int
    output_size: Optional[int] = None
    n_layers: int = 1
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, u=None, training: bool = False):
        x = maybe_cat_exog(x, u)
        for _ in range(self.n_layers):
            x = Dense(self.hidden_size, self.activation,
                      self.dropout)(x, training)
        if self.output_size is not None:
            x = nn.Dense(self.output_size)(x)
        return x


class ResidualMLP(nn.Module):
    """MLP with (optionally parametrized) skip connections
    (``blocks/encoders/mlp.py:54-113``)."""
    hidden_size: int
    output_size: Optional[int] = None
    n_layers: int = 1
    activation: str = "relu"
    dropout: float = 0.0
    parametrized_skip: bool = False

    @nn.compact
    def __call__(self, x, u=None, training: bool = False):
        x = maybe_cat_exog(x, u)
        for i in range(self.n_layers):
            h = Dense(self.hidden_size, self.activation,
                      self.dropout)(x, training)
            h = nn.Dense(self.hidden_size)(h)
            if i == 0 and x.shape[-1] != self.hidden_size:
                skip = nn.Dense(self.hidden_size)(x)
            elif self.parametrized_skip:
                skip = nn.Dense(self.hidden_size)(x)
            else:
                skip = x
            x = h + skip
        if self.output_size is not None:
            x = nn.Dense(self.output_size)(x)
        return x


class LinearReadout(nn.Module):
    """Last-step linear multi-horizon readout
    (``blocks/decoders/linear_readout.py:5-33``): ``[b (s) n f]`` ->
    ``[b h n c]``."""
    output_size: int
    horizon: int = 1

    @nn.compact
    def __call__(self, h):
        if h.ndim == 4:
            h = h[:, -1]
        out = nn.Dense(self.output_size * self.horizon)(h)
        # [b n (h c)] -> [b h n c]
        b, n = out.shape[0], out.shape[1]
        return out.reshape(b, n, self.horizon, self.output_size
                           ).transpose(0, 2, 1, 3)


class MLPDecoder(nn.Module):
    """Flatten the last ``receptive_field`` steps -> MLP -> horizon
    (``blocks/decoders/mlp_decoder.py:9-55``)."""
    hidden_size: int
    output_size: int
    horizon: int = 1
    receptive_field: int = 1
    n_layers: int = 1
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, training: bool = False):
        # h: [b s n f] -> take last R steps and flatten channels
        if h.ndim == 4:
            h = h[:, -self.receptive_field:]
            h = h.transpose(0, 2, 1, 3).reshape(
                h.shape[0], h.shape[2], -1)  # [b n (r f)]
        out = MLP(self.hidden_size, self.output_size * self.horizon,
                  n_layers=self.n_layers, activation=self.activation,
                  dropout=self.dropout)(h, training=training)
        b, n = out.shape[0], out.shape[1]
        return out.reshape(b, n, self.horizon, self.output_size
                           ).transpose(0, 2, 1, 3)


class StaticGraphEmbedding(nn.Module):
    """Learned per-node embedding table with optional ``token_index``
    gather (``tsl/nn/base/embedding.py:10-101``). Init matches the
    reference's PyG ``inits.uniform``: U(-1/sqrt(emb), +1/sqrt(emb))."""
    n_tokens: int
    emb_size: int

    @nn.compact
    def __call__(self, token_index=None):
        bound = 1.0 / (self.emb_size ** 0.5)

        def init(key, shape, dtype=jnp.float32):
            import jax
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        emb = self.param("emb", init, (self.n_tokens, self.emb_size))
        if token_index is not None:
            return emb[token_index]
        return emb

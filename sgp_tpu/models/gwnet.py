"""GraphWaveNet baseline (flax).

Re-design of ``tsl/nn/models/stgn/graph_wavenet_model.py:16-177`` with
the ``node_index``-aware learned adjacency of the lib wrapper
(``lib/nn/models/gwnet_model.py:9-54``): gated TCN x diffusion-conv
residual stack, skip accumulation into a nonlinear MLP horizon readout,
plus a dense learned adjacency from source/target node embeddings
(relu(E_s E_t^T) row-softmax) applied via order-K dense diffusion
(``dense_spatial_conv.py:9-125``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from sgp_tpu.models.blocks import MLPDecoder, StaticGraphEmbedding
from sgp_tpu.models.graph_layers import DiffConv
from sgp_tpu.models.tcn import Norm, TemporalConvNet
from sgp_tpu.ops.spmm import Operator


class DenseSpatialConvOrderK(nn.Module):
    """Dense order-K diffusion with a batch-shared dense adjacency
    (``dense_spatial_conv.py``); ``include_self=False``. ``adj`` may be
    a single ``[n, n]`` row-stochastic support or a stacked ``[s, n, n]``
    list of supports (``compute_support``'s forward+backward pair)."""
    output_size: int
    order: int = 2

    @staticmethod
    def compute_support(adj):
        """Row-normalized forward + backward supports from a raw dense
        adjacency (``dense_spatial_conv.py:34-41``)."""
        eps = 1e-8
        fwd = adj / (adj.sum(1, keepdims=True) + eps)
        bwd = adj.T / (adj.T.sum(1, keepdims=True) + eps)
        return jnp.stack([fwd, bwd])

    @nn.compact
    def __call__(self, x, adj):
        # x: [b s n c]
        supports = adj[None] if adj.ndim == 2 else adj
        out = []
        for i in range(supports.shape[0]):
            cur = x
            for _ in range(self.order):
                cur = jnp.einsum("ij,bsjc->bsic", supports[i], cur)
                out.append(cur)
        return nn.Dense(self.output_size)(jnp.concatenate(out, -1))


class GraphWaveNetModel(nn.Module):
    hidden_size: int
    ff_size: int
    output_size: int
    horizon: int
    n_layers: int = 8
    exog_size: int = 0
    temporal_kernel_size: int = 2
    spatial_kernel_size: int = 2
    learned_adjacency: bool = True
    n_nodes: Optional[int] = None
    emb_size: int = 10
    dilation: int = 2
    dilation_mod: int = 2
    norm: str = "batch"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, supports: Sequence[Operator], u=None,
                 node_index=None, training: bool = False):
        # x: [b s n c]
        if u is not None:
            if u.ndim == 3:
                u = jnp.broadcast_to(u[:, :, None, :],
                                     x.shape[:3] + (u.shape[-1],))
            x = jnp.concatenate([x, u], -1)

        receptive_field = 1
        dilations = []
        for i in range(self.n_layers):
            d = self.dilation ** (i % self.dilation_mod)
            dilations.append(d)
            receptive_field += d * (self.temporal_kernel_size - 1)
        if receptive_field > x.shape[1]:
            x = jnp.pad(x, ((0, 0), (receptive_field - x.shape[1], 0),
                            (0, 0), (0, 0)))

        if self.learned_adjacency:
            # node_index-aware slice (``lib/nn/models/gwnet_model.py``)
            src = StaticGraphEmbedding(self.n_nodes, self.emb_size)(
                token_index=node_index)
            dst = StaticGraphEmbedding(self.n_nodes, self.emb_size)(
                token_index=node_index)
            adj_z = nn.softmax(nn.relu(src @ dst.T), axis=1)

        x = nn.Dense(self.hidden_size)(x)
        out = jnp.zeros(x.shape[:1] + (x.shape[1], 1, 1), x.dtype)
        for i, d in enumerate(dilations):
            res = x
            x = TemporalConvNet(self.hidden_size,
                                self.temporal_kernel_size, dilation=d,
                                gated=True, causal_padding=False)(x)
            out = nn.Dense(self.ff_size)(x) + out[:, -x.shape[1]:]
            xs = DiffConv(self.hidden_size,
                          self.spatial_kernel_size)(x, supports)
            if self.learned_adjacency:
                x = xs + DenseSpatialConvOrderK(
                    self.hidden_size, self.spatial_kernel_size)(x, adj_z)
            else:
                x = xs
            if self.dropout > 0:
                x = nn.Dropout(self.dropout,
                               deterministic=not training)(x)
            x = x + res[:, -x.shape[1]:]
            x = Norm(self.norm)(x)

        out = nn.relu(out)
        return MLPDecoder(2 * self.ff_size, self.output_size,
                          horizon=self.horizon, activation="relu"
                          )(out, training=training)

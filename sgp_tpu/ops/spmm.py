"""Device-side sparse matrix × dense matrix products (the propagation op).

TPU-native replacement for torch_sparse's ``SparseTensor @ x``
(``lib/sgp_preprocessing.py:200-203``, ``lib/nn/reservoir/
graph_reservoir.py:82-83``, ``tsl/nn/layers/graph_convs/diff_conv.py``).

Three interchangeable operator representations, all jit-compatible pytrees:

- :class:`DenseOperator` — the operator materialized dense ``[N, N]``;
  ``x' = A @ x`` is a single MXU matmul. On TPU this is the fastest path for
  every benchmark graph in the reference (N <= 6,435; density 1.5-15%):
  the MXU turns the "sparse" problem into a dense one at speed-of-light.
- :class:`BSROperator` — 128x128 block-sparse rows + a Pallas kernel that
  skips zero blocks (``sgp_tpu/ops/bsr_kernel.py``); wins once the graph is
  large AND block-sparse (big diagonal-ish graphs).
- :class:`COOOperator` — gather + ``segment_sum``; the XLA fallback and
  correctness oracle, and the only O(E) path for extremely sparse graphs.

``build_operator`` picks a representation from graph size/density.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from sgp_tpu.graph.sparse import Graph


@jax.tree_util.register_pytree_node_class
class DenseOperator:
    """Dense ``A[dst, src]``; propagation is one MXU matmul.

    ``precision`` controls the MXU pass count for float32 inputs:
    ``'highest'`` (default) gives full f32 accuracy for parity with the
    reference's fp32 SpMM; ``'default'`` lets the MXU run bf16 passes
    (~3x faster) — fine for training, not for activation-allclose checks.
    """

    def __init__(self, mat: jnp.ndarray, precision: str = "highest"):
        self.mat = mat
        self.precision = precision

    @property
    def num_nodes(self) -> int:
        return self.mat.shape[0]

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [..., N, F] -> contract over N
        return jnp.einsum("ij,...jf->...if", self.mat, x,
                          precision=self.precision,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)

    def transpose(self) -> "DenseOperator":
        return DenseOperator(self.mat.T, self.precision)

    def tree_flatten(self):
        return (self.mat,), self.precision

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


@jax.tree_util.register_pytree_node_class
class COOOperator:
    """COO gather/segment-sum: ``out[d] += w_e * x[s_e]``."""

    def __init__(self, src, dst, weight, num_nodes: int):
        self.src = src
        self.dst = dst
        self.weight = weight
        self._num_nodes = int(num_nodes)

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 2:  # [N, F]
            msgs = x[self.src] * self.weight[:, None]
            return jax.ops.segment_sum(msgs, self.dst,
                                       num_segments=self._num_nodes)
        # [..., N, F]: flatten leading dims, vmap the 2-D case
        lead = x.shape[:-2]
        flat = x.reshape((-1,) + x.shape[-2:])
        out = jax.vmap(lambda xi: self @ xi)(flat)
        return out.reshape(lead + out.shape[-2:])

    def transpose(self) -> "COOOperator":
        return COOOperator(self.dst, self.src, self.weight, self._num_nodes)

    def tree_flatten(self):
        return (self.src, self.dst, self.weight), self._num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


@jax.tree_util.register_pytree_node_class
class BSROperator:
    """128x128 block-sparse operator with two execution variants:
    ``'xla'`` (default) — tile gather + ONE batched MXU matmul +
    sorted segment-sum (measured 1.23G edges/s at N=40960; large XLA
    ops pipeline with no per-block DMA cost); ``'pallas'`` — the
    hand-pipelined kernel in ``ops/bsr_kernel.py`` (0.89G measured;
    half the HBM traffic, per-block DMA issue bound).

    Construct via :meth:`from_bsr` (host prep happens once there); the
    instance is then a pure pytree of device arrays, safe to pass through
    jit (``__matmul__`` never touches host numpy).
    """

    BLOCK = 128

    def __init__(self, blocks, block_cols, row_ptr, block_rows,
                 num_nodes: int, n_block_rows: int,
                 variant: str = "xla"):
        self.blocks = blocks                # [nnzb, B, B] f32 or bf16
        self.block_cols = block_cols        # [nnzb]
        self.row_ptr = row_ptr              # [n_block_rows + 1]
        self.block_rows = block_rows        # [nnzb] (sorted)
        self._num_nodes = int(num_nodes)
        self._n_block_rows = int(n_block_rows)
        self._variant = variant             # 'xla' | 'pallas'

    @classmethod
    def from_bsr(cls, blocks, block_cols, row_ptr, num_nodes: int,
                 dtype=jnp.float32, variant: str = "xla"
                 ) -> "BSROperator":
        from sgp_tpu.ops.bsr_kernel import prepare_bsr
        import numpy as np
        b, cols, ptr = prepare_bsr(blocks, block_cols, row_ptr, dtype)
        rows = np.repeat(np.arange(len(ptr) - 1, dtype=np.int32),
                         np.diff(ptr))
        return cls(jnp.asarray(b), jnp.asarray(cols), jnp.asarray(ptr),
                   jnp.asarray(rows), num_nodes, len(ptr) - 1, variant)

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    def _spmm2d(self, x: jnp.ndarray) -> jnp.ndarray:
        from sgp_tpu.ops.bsr_kernel import (bsr_spmm_prepared,
                                            bsr_spmm_xla)
        if self._variant == "pallas":
            return bsr_spmm_prepared(self.blocks, self.block_cols,
                                     self.row_ptr, x, self._num_nodes,
                                     self._n_block_rows)
        return bsr_spmm_xla(self.blocks, self.block_cols,
                            self.block_rows, x, self._num_nodes,
                            self._n_block_rows)

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 2:
            return self._spmm2d(x)
        lead = x.shape[:-2]
        flat = x.reshape((-1,) + x.shape[-2:])
        out = jax.vmap(self._spmm2d)(flat)
        return out.reshape(lead + out.shape[-2:])

    def tree_flatten(self):
        return ((self.blocks, self.block_cols, self.row_ptr,
                 self.block_rows),
                (self._num_nodes, self._n_block_rows, self._variant))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1], aux[2])


@jax.tree_util.register_pytree_node_class
class GlobalMeanOperator:
    """The dense ``1/N`` matrix of the reference's ``global_attr`` support
    (``lib/sgp_preprocessing.py:155-158``) — i.e. broadcast mean over nodes.
    Implemented as an O(N·F) reduction instead of an O(N²·F) matmul."""

    def __init__(self, num_nodes: int):
        self._num_nodes = int(num_nodes)

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        return jnp.broadcast_to(mean, x.shape)

    def transpose(self) -> "GlobalMeanOperator":
        return self

    def tree_flatten(self):
        return (), self._num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux)


Operator = Union[DenseOperator, COOOperator, BSROperator, GlobalMeanOperator]


def build_operator(g: Graph, mode: str = "auto", dtype=jnp.float32,
                   precision: str = "highest") -> Operator:
    """Lift a host :class:`Graph` into a device propagation operator.

    ``auto`` heuristic: dense for graphs that comfortably fit HBM as an
    ``[N, N]`` tile (the MXU path — fastest for every reference benchmark),
    BSR when large but block-structured, COO otherwise.
    """
    if mode == "auto":
        dense_bytes = g.num_nodes * g.num_nodes * np.dtype(np.float32).itemsize
        if dense_bytes <= 512 * 1024 * 1024:  # <= 512 MB dense operator
            mode = "dense"
        else:
            blocks, cols, ptr = g.to_bsr(BSROperator.BLOCK)
            block_density = len(cols) / max(
                1, (ptr.shape[0] - 1) ** 2)
            mode = "bsr" if block_density < 0.5 else "coo"
    if mode == "dense":
        # scatter the edge list into [N, N] ON DEVICE: uploading the
        # host-densified matrix moves N^2 bytes over the device link
        # (~200 MB -> ~170 s at PV-US scale through the remote tunnel,
        # measured as bench's 'dcrnn_train_compile_s'); the edge list
        # is ~E*12 bytes. .add matches scipy's duplicate-sum semantics
        # (edges are coalesced anyway).
        src = jnp.asarray(g.src.astype(np.int32))
        dst = jnp.asarray(g.dst.astype(np.int32))
        w = jnp.asarray(g.weight, dtype)
        mat = jax.jit(
            lambda s, d, ww: jnp.zeros(
                (g.num_nodes, g.num_nodes), dtype).at[d, s].add(ww)
        )(src, dst, w)
        return DenseOperator(mat, precision)
    if mode == "bsr":
        blocks, cols, ptr = g.to_bsr(BSROperator.BLOCK)
        # precision='default' -> bf16 block storage: halves the
        # kernel's dominant HBM traffic; accumulation stays f32.
        bsr_dtype = (jnp.bfloat16 if precision == "default"
                     and dtype == jnp.float32 else dtype)
        return BSROperator.from_bsr(blocks, cols, ptr, g.num_nodes,
                                    bsr_dtype)
    if mode == "coo":
        return COOOperator(jnp.asarray(g.src), jnp.asarray(g.dst),
                           jnp.asarray(g.weight, dtype), g.num_nodes)
    raise ValueError(f"unknown operator mode {mode!r}")


def dense_adj_mask(g: Graph, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Binary dense adjacency ``mask[dst, src]`` (the repo's
    ``Graph.to_dense`` orientation) scattered ON DEVICE from the edge
    list — uploads ``~E*8`` bytes instead of the ``N^2`` host-densified
    matrix (~165 MB -> minutes through the ~MB/s tunnel at Table-2
    scale). The GatedGN dense all-pairs aggregation input."""
    src_h, dst_h = g.src, g.dst
    if g.weight is not None:
        # explicitly-stored zeros are structure, not edges — keep
        # parity with the host (to_dense() != 0) semantics
        keep = np.asarray(g.weight) != 0
        src_h, dst_h = src_h[keep], dst_h[keep]
    src = jnp.asarray(src_h.astype(np.int32))
    dst = jnp.asarray(dst_h.astype(np.int32))
    n = g.num_nodes
    return jax.jit(
        lambda s, d: jnp.zeros((n, n), dtype).at[d, s].set(
            jnp.ones((), dtype)))(src, dst)


def spmm(op: Operator, x: jnp.ndarray) -> jnp.ndarray:
    """``x' = A @ x`` for any operator representation."""
    return op @ x

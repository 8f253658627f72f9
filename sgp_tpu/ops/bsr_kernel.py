"""Pallas TPU kernel: block-sparse-row SpMM.

The TPU-native answer to torch_sparse's CSR SpMM: instead of per-edge
gather/scatter (bad for the MXU), the operator is packed into dense
128x128 tiles at the nonzero block positions (``Graph.to_bsr``), and the
kernel runs one MXU matmul per stored block, skipping zero blocks entirely.
Block indices are scalar-prefetched so the data-dependent ``x`` block row
for each tile is resolved before the kernel body runs.

Grid layout: ``(F_tiles, nnzb)`` with the block index innermost, so all
blocks of one block-row hit the same output tile in consecutive grid steps
and accumulate in VMEM (output revisiting).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _kernel(rows_ref, cols_ref, first_ref, blocks_ref, x_ref, out_ref):
    b = pl.program_id(1)

    @pl.when(first_ref[b] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(blocks_ref[0], x_ref[:],
                          preferred_element_type=jnp.float32
                          ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_nodes", "interpret"))
def _bsr_spmm_padded(blocks, block_rows, block_cols, first_in_row, x_pad,
                     num_nodes: int, interpret: bool = False):
    n_pad, f_pad = x_pad.shape
    nnzb = blocks.shape[0]
    f_tiles = f_pad // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(f_tiles, nnzb),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda j, b, rows, cols, first: (b, 0, 0)),
            pl.BlockSpec((BLOCK, BLOCK),
                         lambda j, b, rows, cols, first: (cols[b], j)),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, BLOCK),
            lambda j, b, rows, cols, first: (rows[b], j)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), x_pad.dtype),
        interpret=interpret,
    )(block_rows, block_cols, first_in_row, blocks, x_pad)
    return out


def prepare_bsr(blocks: np.ndarray, block_cols: np.ndarray,
                row_ptr: np.ndarray):
    """Host-side prep (static per graph, done ONCE at operator build so
    the kernel entry is jit-safe): derive per-block row ids and
    first-in-row markers; guarantee every block row has at least one
    block (empty rows get an all-zero block) so every output tile is
    written. Returns ``(blocks, rows, cols, first)`` numpy arrays."""
    row_ptr_np = np.asarray(row_ptr)
    cols_np = np.asarray(block_cols)
    blocks_np = np.asarray(blocks)
    n_br = len(row_ptr_np) - 1
    counts = np.diff(row_ptr_np)
    if (counts == 0).any():
        # splice a zero block into each empty block row
        new_cols, new_rows, new_first, new_blocks_idx = [], [], [], []
        for r in range(n_br):
            s, e = row_ptr_np[r], row_ptr_np[r + 1]
            if e > s:
                new_cols.extend(cols_np[s:e])
                new_blocks_idx.extend(range(s, e))
            else:
                new_cols.append(0)
                new_blocks_idx.append(-1)
            new_rows.extend([r] * max(1, e - s))
            new_first.extend([1] + [0] * (max(1, e - s) - 1))
        zero = np.zeros((1, BLOCK, BLOCK), blocks_np.dtype)
        padded = np.concatenate([blocks_np, zero], axis=0)
        blocks_np = padded[np.asarray(new_blocks_idx)]
        rows = np.asarray(new_rows, np.int32)
        cols = np.asarray(new_cols, np.int32)
        first = np.asarray(new_first, np.int32)
    else:
        rows = np.repeat(np.arange(n_br, dtype=np.int32), counts)
        first = np.zeros(len(cols_np), np.int32)
        first[row_ptr_np[:-1]] = 1
        cols = cols_np.astype(np.int32)
    return blocks_np, rows, cols, first


def bsr_spmm_prepared(blocks: jnp.ndarray, rows: jnp.ndarray,
                      cols: jnp.ndarray, first: jnp.ndarray,
                      x: jnp.ndarray, num_nodes: int,
                      n_block_rows: int) -> jnp.ndarray:
    """Jit-safe kernel entry on prepared arrays (``prepare_bsr``)."""
    n_pad = n_block_rows * BLOCK
    f = x.shape[-1]
    f_pad = ((f + BLOCK - 1) // BLOCK) * BLOCK
    x_pad = jnp.zeros((n_pad, f_pad), x.dtype)
    x_pad = x_pad.at[:x.shape[0], :f].set(x)
    interpret = jax.default_backend() == "cpu"
    out = _bsr_spmm_padded(blocks, rows, cols, first, x_pad,
                           num_nodes=num_nodes, interpret=interpret)
    return out[:num_nodes, :f]


def bsr_spmm(blocks: jnp.ndarray, block_cols: jnp.ndarray,
             row_ptr: jnp.ndarray, x: jnp.ndarray,
             num_nodes: int) -> jnp.ndarray:
    """``out = A @ x`` for raw BSR inputs (host prep inline — NOT
    jit-safe; prefer :class:`~sgp_tpu.ops.spmm.BSROperator`, which
    prepares once at build time)."""
    blocks_np, rows, cols, first = prepare_bsr(blocks, block_cols,
                                               row_ptr)
    n_br = len(np.asarray(row_ptr)) - 1
    return bsr_spmm_prepared(jnp.asarray(blocks_np), jnp.asarray(rows),
                             jnp.asarray(cols), jnp.asarray(first),
                             x, num_nodes, n_br)

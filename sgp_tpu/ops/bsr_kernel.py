"""Pallas TPU kernel: block-sparse-row SpMM.

The TPU-native answer to torch_sparse's CSR SpMM: instead of per-edge
gather/scatter (bad for the MXU), the operator is packed into dense
128x128 tiles at the nonzero block positions (``Graph.to_bsr``), and the
kernel runs one MXU matmul per stored block, skipping zero blocks
entirely.

Kernel design (v3, round 3): ONE grid step per F tile; the kernel walks
the whole block store in global order with a software pipeline —
the (operator-block, x-tile) pair for block ``g+1`` is always in
flight while block ``g`` multiplies, across row boundaries (v2
restarted the pipeline at every block row, exposing one DMA latency
per row; measured 788M edges/s vs v3's target of the HBM bound).
Output tiles accumulate in VMEM f32 and are DMA'd back to HBM
double-buffered, overlapping the next row's compute.

Operator blocks may be stored bf16 (halving the dominant HBM traffic;
x tiles are then moved as bf16 too and the matmul accumulates f32 via
``preferred_element_type``) — the like-for-like setting against the
reference's TF32 CUDA SpMM.

Block indices (``row_ptr``, ``cols``) are scalar-prefetched so the
data-dependent DMA addresses resolve before the kernel body runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _make_flat_kernel(nnzb: int, n_br: int, highest: bool):
    # f32 blocks get full-precision MXU passes: the kernel is
    # DMA-bound (~780 ns/block vs ~130 ns for 6 passes), so the extra
    # passes are free and the f32 path stays a valid parity oracle
    prec = jax.lax.Precision.HIGHEST if highest else None

    def kernel(ptr_ref, cols_ref, blocks_hbm, x_hbm, out_hbm,
               blk_scr, x_scr, out_scr, sems, out_sems):
        j = pl.program_id(0)

        def blk_dma(slot, g):
            return pltpu.make_async_copy(
                blocks_hbm.at[g], blk_scr.at[slot], sems.at[slot, 0])

        def x_dma(slot, g):
            c = cols_ref[g]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(c * BLOCK, BLOCK),
                         pl.ds(j * BLOCK, BLOCK)],
                x_scr.at[slot], sems.at[slot, 1])

        def out_dma(slot, r):
            return pltpu.make_async_copy(
                out_scr.at[slot],
                out_hbm.at[pl.ds(r * BLOCK, BLOCK),
                           pl.ds(j * BLOCK, BLOCK)],
                out_sems.at[slot])

        if nnzb > 0:
            blk_dma(0, 0).start()
            x_dma(0, 0).start()

        def row_body(r, carry):
            start = ptr_ref[r]
            end = ptr_ref[r + 1]

            def body(g, acc):
                slot = jax.lax.rem(g, 2)
                nxt = jax.lax.rem(g + 1, 2)

                @pl.when(g + 1 < nnzb)
                def _():
                    blk_dma(nxt, g + 1).start()
                    x_dma(nxt, g + 1).start()

                blk_dma(slot, g).wait()
                x_dma(slot, g).wait()
                return acc + jnp.dot(
                    blk_scr[slot], x_scr[slot], precision=prec,
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                start, end, body,
                jnp.zeros((BLOCK, BLOCK), jnp.float32))
            oslot = jax.lax.rem(r, 2)

            # this out slot was shipped two rows ago — reclaim it
            @pl.when(r >= 2)
            def _():
                out_dma(oslot, r - 2).wait()

            out_scr[oslot] = acc.astype(out_scr.dtype)
            out_dma(oslot, r).start()
            return carry

        jax.lax.fori_loop(0, n_br, row_body, 0)
        # drain the last two in-flight output DMAs
        if n_br >= 2:
            out_dma(jax.lax.rem(n_br - 2, 2), n_br - 2).wait()
        if n_br >= 1:
            out_dma(jax.lax.rem(n_br - 1, 2), n_br - 1).wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_block_rows", "interpret"))
def _bsr_spmm_padded(blocks, block_cols, row_ptr, x_pad,
                     n_block_rows: int, interpret: bool = False):
    n_pad, f_pad = x_pad.shape
    nnzb = blocks.shape[0]
    f_tiles = f_pad // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(f_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # blocks stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # DMA'd manually
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK, BLOCK), blocks.dtype),
            pltpu.VMEM((2, BLOCK, BLOCK), x_pad.dtype),
            pltpu.VMEM((2, BLOCK, BLOCK), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    bytes_blk = nnzb * BLOCK * BLOCK * blocks.dtype.itemsize * f_tiles
    bytes_x = nnzb * BLOCK * BLOCK * x_pad.dtype.itemsize * f_tiles
    out = pl.pallas_call(
        _make_flat_kernel(int(nnzb), int(n_block_rows),
                          blocks.dtype == jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_block_rows * BLOCK, f_pad),
                                       x_pad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * BLOCK * BLOCK * BLOCK * f_tiles,
            bytes_accessed=bytes_blk + bytes_x,
            transcendentals=0),
        interpret=interpret,
    )(row_ptr, block_cols, blocks, x_pad)
    return out


def prepare_bsr(blocks: np.ndarray, block_cols: np.ndarray,
                row_ptr: np.ndarray, dtype=np.float32):
    """Host-side prep (static per graph, done ONCE at operator build so
    the kernel entry is jit-safe): contiguous int32 index arrays and the
    block store in the compute dtype (bf16 storage halves HBM traffic).
    Rows without blocks need no padding — the kernel writes their
    output tile as zeros."""
    return (np.asarray(blocks, dtype),
            np.asarray(block_cols, np.int32),
            np.asarray(row_ptr, np.int32))


def bsr_spmm_prepared(blocks: jnp.ndarray, block_cols: jnp.ndarray,
                      row_ptr: jnp.ndarray, x: jnp.ndarray,
                      num_nodes: int, n_block_rows: int) -> jnp.ndarray:
    """Jit-safe kernel entry on prepared arrays (``prepare_bsr``)."""
    n_pad = n_block_rows * BLOCK
    f = x.shape[-1]
    f_pad = ((f + BLOCK - 1) // BLOCK) * BLOCK
    # bf16 blocks -> move x tiles as bf16 too (the caller opted into
    # 'default' matmul precision); accumulation stays f32 in VMEM
    xdt = jnp.bfloat16 if blocks.dtype == jnp.bfloat16 else x.dtype
    x_pad = jnp.zeros((n_pad, f_pad), xdt)
    x_pad = x_pad.at[:x.shape[0], :f].set(x.astype(xdt))
    interpret = jax.default_backend() == "cpu"
    out = _bsr_spmm_padded(blocks, block_cols, row_ptr, x_pad,
                           n_block_rows=n_block_rows,
                           interpret=interpret)
    return out[:num_nodes, :f].astype(x.dtype)


def bsr_spmm(blocks: jnp.ndarray, block_cols: jnp.ndarray,
             row_ptr: jnp.ndarray, x: jnp.ndarray,
             num_nodes: int) -> jnp.ndarray:
    """``out = A @ x`` for raw BSR inputs (host prep inline — NOT
    jit-safe; prefer :class:`~sgp_tpu.ops.spmm.BSROperator`, which
    prepares once at build time)."""
    blocks_np, cols, ptr = prepare_bsr(blocks, block_cols, row_ptr)
    n_br = len(np.asarray(row_ptr)) - 1
    return bsr_spmm_prepared(jnp.asarray(blocks_np), jnp.asarray(cols),
                             jnp.asarray(ptr), x, num_nodes, n_br)


def bsr_spmm_xla(blocks: jnp.ndarray,        # [nnzb, B, B]
                 block_cols: jnp.ndarray,    # [nnzb]
                 block_rows: jnp.ndarray,    # [nnzb] (sorted)
                 x: jnp.ndarray, num_nodes: int,
                 n_block_rows: int) -> jnp.ndarray:
    """BSR SpMM as pure XLA: gather the x tile per stored block (one
    wide tile gather), ONE batched MXU matmul over all blocks, then a
    sorted segment-sum over block rows.

    ~2x the ideal kernel's HBM traffic (the per-block products
    materialize), but every op is a large deeply-pipelined XLA op with
    no per-block DMA issue cost — measured 1.23G edges/s at N=40960
    vs the Pallas kernel's 0.89G (f32), so this is the default
    ``BSROperator`` execution path; the Pallas kernel remains as
    ``variant='pallas'``."""
    f = x.shape[-1]
    n_pad = n_block_rows * BLOCK
    xdt = jnp.bfloat16 if blocks.dtype == jnp.bfloat16 else x.dtype
    x_pad = jnp.zeros((n_pad, f), xdt)
    x_pad = x_pad.at[:x.shape[0]].set(x.astype(xdt))
    xt = x_pad.reshape(n_block_rows, BLOCK, f)[block_cols]
    prec = (jax.lax.Precision.HIGHEST
            if blocks.dtype == jnp.float32 else None)
    mm = jax.lax.dot_general(blocks, xt, (((2,), (1,)), ((0,), (0,))),
                             precision=prec,
                             preferred_element_type=jnp.float32)
    agg = jax.ops.segment_sum(mm, block_rows,
                              num_segments=n_block_rows,
                              indices_are_sorted=True)
    return agg.reshape(n_pad, f)[:num_nodes].astype(x.dtype)

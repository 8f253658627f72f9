"""Fused Pallas TPU kernel for GatedGN dense all-pairs message passing.

The GatedGraphNetwork edge stage (reference
``tsl/nn/layers/graph_convs/gated_gn.py``-style message function, see
``sgp_tpu/models/graph_layers.py::GatedGraphNetwork``) computes, for
every (dst ``i``, src ``j``) pair::

    s_ij  = p_i[i] + p_j[j]                  # [h2]; first edge layer,
    t_ij  = act(s_ij)                        #   split into node GEMMs
    mt_ij = t_ij @ w2 + b2                   # [h]; second edge layer
    mb_ij = act(mt_ij)
    g_ij  = sigmoid(mb_ij @ wg + bg)         # edge gate (scalar)
    out[i] = sum_j mask[i, j] * g_ij * mb_ij

On dense-ish graphs (the Table-2 "full" rows, 7-15% density) computing
ALL ``N^2`` messages on the MXU beats per-edge gathers — but the XLA
blocked implementation must materialize the ``[blk, N, h]`` message
tensors in HBM between the two GEMMs (measured: the CER-En full row
runs at 6.7% MFU, pure HBM bandwidth on ~N^2*h*3 bytes per layer).
This kernel keeps every per-pair tensor in VMEM: per (row-block,
col-block) grid step the whole chain above runs on-chip and only the
node-space inputs/outputs and the ``[N, N]`` mask touch HBM.

Layout: channel dims ride the SUBLANES (h2/h = 32/64 rows), pair
columns ride the LANES (block of 128 src nodes) — zero lane padding
for the narrow channel counts, unlike a pairs-major layout which pads
h2=32 lanes to 128 (4x VPU waste).

Backward (``jax.custom_vjp``) recomputes the forward tiles (the N^2
intermediates are never stored — same rematerialization the XLA path
gets from ``jax.checkpoint``, but in VMEM): ONE pass over (dst-block,
src-block) pairs in which each tile's ``ds_ij`` feeds BOTH node grads
— its row sum accumulates into d_pi and its column sum into d_pj, via
``pl.ds`` row/col-indexed updates of whole-array VMEM output blocks.
Weight-gradient tiles likewise accumulate in constant-index f32
output blocks across the whole sequential grid. The d_pi/d_pj blocks
are ``[1, Npad, h2]`` f32 and must FIT VMEM — callers gate on N (see
``max_pallas_nodes``) and fall back to the blocked-XLA path beyond.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _dtanh(x):
    t = jnp.tanh(x)
    return 1.0 - t * t


def _drelu(x):
    return (x > 0).astype(x.dtype)


def _delu(x):
    return jnp.where(x > 0, jnp.ones_like(x), jnp.exp(x))


def _f32_compute(fn, keep_dtype: bool):
    """Transcendentals run in f32 inside the kernel: Mosaic's bf16
    ``logistic`` lowering emits an invalid f32->bf16 vector.broadcast
    (verification error, observed on v5e); derivatives stay f32 (they
    multiply f32 cotangents)."""
    def wrapped(x):
        y = fn(x.astype(jnp.float32))
        return y.astype(x.dtype) if keep_dtype else y
    return wrapped


ACTIVATIONS = {
    name: (_f32_compute(f, True), _f32_compute(df, False))
    for name, (f, df) in {
        "silu": (_silu, _dsilu),
        "swish": (_silu, _dsilu),
        "tanh": (jnp.tanh, _dtanh),
        "relu": (jax.nn.relu, _drelu),
        "elu": (jax.nn.elu, _delu),
    }.items()
}

# fwd dst-rows per grid step / bwd rows per step (cols are always 128
# lanes). The fwd row block is the LANE dim of the transposed node
# blocks (must be 128-divisible); the bwd kernel reads the node arrays
# as FULL blocks (tiny: [1, ch, Npad]) and slices 64 rows per step
# with pl.ds — 128-row tiles put ~22 MB of f32 intermediates in VMEM
# (measured over the 16 MB scoped limit).
_FWD_BI = 128
_BWD_BR = 64
_BLK_J = 128


def max_pallas_nodes(h2: int, vmem_budget: int = 10 * 2 ** 20) -> int:
    """Largest node count the backward kernel can hold in VMEM: the
    d_pi/d_pj outputs are whole-array ``[1, Npad, h2]`` f32 blocks
    (``2 * Npad * h2 * 4`` bytes) kept under ``vmem_budget`` so the
    per-tile working set still fits the ~16 MB scoped limit. Callers
    (``models/graph_layers.py``) fall back to the blocked-XLA
    all-pairs path beyond this."""
    mult = int(np.lcm(np.lcm(_FWD_BI, _BLK_J), _BWD_BR))
    n = vmem_budget // (2 * 4 * max(h2, 1))
    return (n // mult) * mult


def _pad_to(x, mult: int, axis: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(act, bi_blk: int, bj_blk: int, piT_ref, pjT_ref,
                mask_ref, w2_ref, b2_ref, wg_ref, bg_ref, outT_ref):
    # Mosaic supports plain 2D matmuls only — all dots run on
    # [ch, pairs]-shaped 2D views; the masked neighbor sum is an
    # elementwise multiply + lane reduction (VPU-cheap at these sizes).
    j = pl.program_id(2)
    h2 = piT_ref.shape[1]
    h = w2_ref.shape[1]
    cdt = piT_ref.dtype
    # minor-dim broadcasts must be 32-bit on Mosaic: build s in f32,
    # drop back to the compute dtype for the MXU contraction
    pi = piT_ref[0].astype(jnp.float32)               # [h2, BI]
    pj = pjT_ref[0].astype(jnp.float32)               # [h2, BJ]
    t = act(pi[:, :, None] + pj[:, None, :])          # [h2, BI, BJ]
    t2 = t.reshape(h2, bi_blk * bj_blk).astype(cdt)   # [h2, P]
    mt = lax.dot_general(w2_ref[:], t2, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mb = act(mt + b2_ref[:].reshape(h, 1))            # [h, P] f32
    gz = lax.dot_general(wg_ref[:], mb, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])             # [1, P]
    gmb = (g * mb).reshape(h, bi_blk, bj_blk)
    masked = gmb * mask_ref[:].astype(jnp.float32)[None]
    agg = jnp.sum(masked, axis=2)                     # [h, BI]

    @pl.when(j == 0)
    def _():
        outT_ref[0] = jnp.zeros_like(outT_ref[0])

    outT_ref[0] += agg


def _bwd_kernel(act, dact, br_blk: int, bc_blk: int, aN_ref, bN_ref,
                mask_ref, w2_ref, b2_ref, wg_ref, bg_ref, ghatN_ref,
                dpi_ref, dpj_ref, dw2_ref, db2_ref, dwg_ref, dbg_ref):
    bi, r, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    h2 = aN_ref.shape[-1]
    h = w2_ref.shape[1]
    cdt = aN_ref.dtype
    p = br_blk * bc_blk
    # ONE pass over all (dst-block, src-block) pairs: ds_ij feeds BOTH
    # node grads (row sum -> d_pi, col sum -> d_pj). The [B, Npad, h2]
    # f32 node-grad arrays are small enough (<1 MB at Table-2 scale)
    # to live as whole constant-index VMEM blocks, so the col-indexed
    # accumulation needs no second recompute pass. Node blocks arrive
    # in NATURAL [1, rows, ch] layout (a [1, ch, R] layout would make
    # the row block the LANE dim, where Mosaic demands
    # 128-divisibility); channels-on-sublanes comes from tiny per-tile
    # transposes.
    a = jnp.transpose(aN_ref[0]).astype(jnp.float32)  # [h2, BR]
    b = jnp.transpose(bN_ref[0]).astype(jnp.float32)  # [h2, BC]
    s = a[:, :, None] + b[:, None, :]                 # [h2, BR, BC]
    s2 = s.reshape(h2, p)                             # f32
    t2 = act(s2).astype(cdt)                          # [h2, P]
    mt = lax.dot_general(w2_ref[:], t2, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mt = mt + b2_ref[:].reshape(h, 1)                 # [h, P] f32
    mb = act(mt)
    gz = lax.dot_general(wg_ref[:], mb, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])             # [1, P]
    maskf = mask_ref[:].astype(jnp.float32)[None]     # [1, BR, BC]
    ghat = jnp.transpose(ghatN_ref[0]).astype(jnp.float32)  # [h, BR]
    e = (maskf * ghat[:, :, None]).reshape(h, p)      # dst-row cotan
    dgz = jnp.sum(e * mb, axis=0, keepdims=True) * g * (1.0 - g)
    dmb = e * g + wg_ref[:].astype(jnp.float32).reshape(h, 1) * dgz
    dmt = dmb * dact(mt)
    # dt[h2, P] = w2 contracted with dmt over h
    dt = lax.dot_general(w2_ref[:], dmt, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds3 = (dt * dact(s2)).reshape(h2, br_blk, bc_blk)

    first = (r == 0) & (c == 0)

    @pl.when(first)
    def _():
        dpi_ref[0] = jnp.zeros_like(dpi_ref[0])
        dpj_ref[0] = jnp.zeros_like(dpj_ref[0])

    @pl.when(first & (bi == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)

    drow = jnp.transpose(jnp.sum(ds3, axis=2))        # [BR, h2]
    dcol = jnp.transpose(jnp.sum(ds3, axis=1))        # [BC, h2]
    dpi_ref[0, pl.ds(r * br_blk, br_blk), :] += drow
    dpj_ref[0, pl.ds(c * bc_blk, bc_blk), :] += dcol
    # dw2[h2, h] = t contracted with dmt over the P pairs
    dw2_ref[:] += lax.dot_general(t2, dmt.astype(t2.dtype),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dmt, axis=1, keepdims=True)   # [h, 1]
    dwg_ref[:] += jnp.sum(mb * dgz, axis=1, keepdims=True)
    dbg_ref[:] += jnp.sum(dgz)[None, None]              # [1, 1]


def _node_specs(h2: int, br: int, bc: int):
    """(piT, pjT, mask) block specs for a (b, r, c) grid."""
    return [
        pl.BlockSpec((1, h2, br), lambda b, r, c: (b, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h2, bc), lambda b, r, c: (b, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((br, bc), lambda b, r, c: (r, c),
                     memory_space=pltpu.VMEM),
    ]


def _weight_specs(h2: int, h: int):
    full = lambda b, r, c: (0, 0)
    return [
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM),
    ]


def _fwd_call(piT, pjT, mask, w2, b2, wgr, bgr, act_name: str,
              interpret: bool):
    act, _ = ACTIVATIONS[act_name]
    bsz, h2, npad = piT.shape
    h = w2.shape[1]
    grid = (bsz, npad // _FWD_BI, npad // _BLK_J)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act, _FWD_BI, _BLK_J),
        out_shape=jax.ShapeDtypeStruct((bsz, h, npad), jnp.float32),
        grid=grid,
        in_specs=_node_specs(h2, _FWD_BI, _BLK_J) + _weight_specs(h2, h),
        out_specs=pl.BlockSpec((1, h, _FWD_BI), lambda b, r, c: (b, 0, r),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * npad * npad * h2 * h,
            bytes_accessed=mask.size * mask.dtype.itemsize
            + 2 * piT.size * piT.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=bsz * npad * npad * (h2 + h + 1)),
    )(piT, pjT, mask, w2, b2, wgr, bgr)
    return out


def _bwd_call(aN, bN, mask, w2, b2, wgr, bgr, ghatN, act_name: str,
              interpret: bool):
    act, dact = ACTIVATIONS[act_name]
    bsz, npad, h2 = aN.shape
    h = w2.shape[1]
    br, bc = _BWD_BR, _BLK_J
    grid = (bsz, npad // br, npad // bc)
    by_r = lambda b, r, c: (b, r, 0)
    by_c = lambda b, r, c: (b, c, 0)
    per_b = lambda b, r, c: (b, 0, 0)
    full = lambda b, r, c: (0, 0)
    node_specs = [
        pl.BlockSpec((1, br, h2), by_r, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bc, h2), by_c, memory_space=pltpu.VMEM),
        pl.BlockSpec((br, bc), lambda b, r, c: (r, c),
                     memory_space=pltpu.VMEM),
    ]
    ghat_spec = pl.BlockSpec((1, br, h), by_r, memory_space=pltpu.VMEM)
    out_shapes = (jax.ShapeDtypeStruct((bsz, npad, h2), jnp.float32),
                  jax.ShapeDtypeStruct((bsz, npad, h2), jnp.float32),
                  jax.ShapeDtypeStruct((h2, h), jnp.float32),
                  jax.ShapeDtypeStruct((h, 1), jnp.float32),
                  jax.ShapeDtypeStruct((h, 1), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs = (
        pl.BlockSpec((1, npad, h2), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npad, h2), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, act, dact, br, bc),
        out_shape=out_shapes,
        grid=grid,
        in_specs=node_specs + _weight_specs(h2, h) + [ghat_spec],
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * bsz * npad * npad * h2 * h,
            bytes_accessed=mask.size * mask.dtype.itemsize
            + 2 * aN.size * aN.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=3 * bsz * npad * npad * (h2 + h + 1)),
    )(aN, bN, mask, w2, b2, wgr, bgr, ghatN)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gn_allpairs_aggregate(p_i, p_j, mask, w2, b2, wg, bg,
                          activation: str = "silu",
                          interpret: bool = False):
    """Gated all-pairs message aggregation, fused on TPU.

    Args:
      p_i: ``[B, N, h2]`` dst-side projections (``W_i x + b_i``).
      p_j: ``[B, N, h2]`` src-side projections (``W_j x``).
      mask: ``[N, N]``, ``mask[dst, src] != 0`` marks an edge
        (weights are ignored — GatedGN messages are unweighted).
        NON-DIFFERENTIABLE: the VJP returns a hard-zero cotangent for
        ``mask``, so a learnable/weighted adjacency (e.g. a
        GWNet-style adaptive adj) would silently train with a frozen
        graph — wrap such a mask in ``lax.stop_gradient`` to make the
        intent explicit, or use the blocked-XLA path.
      w2, b2: second edge-MLP layer ``[h2, h]``, ``[h]``.
      wg, bg: gate layer ``[h, 1]``, ``[1]``.
      activation: one of ``ACTIVATIONS``.
      interpret: run the Pallas interpreter (CPU tests).

    Returns:
      ``[B, N, h]`` float32 aggregated messages
      (``sum_j mask * gate * message``).
    """
    out, _ = _gn_fwd(p_i, p_j, mask, w2, b2, wg, bg, activation,
                     interpret)
    return out


def _prep(p_i, p_j, mask):
    n = p_i.shape[-2]
    mult = int(np.lcm(np.lcm(_FWD_BI, _BLK_J), _BWD_BR))
    pi_p = _pad_to(p_i, mult, 1)                      # [B, Npad, h2]
    pj_p = _pad_to(p_j, mult, 1)
    maskp = _pad_to(_pad_to(mask, mult, 0), mult, 1)
    return pi_p, pj_p, maskp, n


def _gn_fwd(p_i, p_j, mask, w2, b2, wg, bg, activation, interpret):
    pi_p, pj_p, maskp, n = _prep(p_i, p_j, mask)
    cd = pi_p.dtype
    maskb = (maskp != 0).astype(cd)
    w2c = w2.astype(cd)
    b2r = b2.astype(jnp.float32).reshape(1, -1)
    wgr = wg.astype(cd).reshape(1, -1)
    bgr = bg.astype(jnp.float32).reshape(1, 1)
    piT = jnp.swapaxes(pi_p, -1, -2)
    pjT = jnp.swapaxes(pj_p, -1, -2)
    out = jnp.swapaxes(
        _fwd_call(piT, pjT, maskb, w2c, b2r, wgr, bgr, activation,
                  interpret)[:, :, :n], -1, -2)
    # zero-size protos carry the primal dtypes (bwd outputs must match
    # the primal avals; dtype objects aren't valid pytree leaves)
    protos = tuple(jnp.zeros((0,), a.dtype)
                   for a in (mask, w2, b2, wg, bg))
    return out, (pi_p, pj_p, maskb, w2c, b2r, wgr, bgr, protos, n)


def _gn_bwd(activation, interpret, res, ghat):
    pi_p, pj_p, maskb, w2c, b2r, wgr, bgr, protos, n = res
    npad = pi_p.shape[1]
    ghatN = ghat if npad == n else jnp.pad(
        ghat, ((0, 0), (0, npad - n), (0, 0)))
    ghatN = ghatN.astype(pi_p.dtype)
    dpiN, dpjN, dw2, db2, dwg, dbg = _bwd_call(
        pi_p, pj_p, maskb, w2c, b2r, wgr, bgr, ghatN, activation,
        interpret)
    dpi = dpiN[:, :n]
    dpj = dpjN[:, :n]
    dt_mask, dt_w2, dt_b2, dt_wg, dt_bg = (p.dtype for p in protos)
    return (dpi.astype(pi_p.dtype), dpj.astype(pj_p.dtype),
            jnp.zeros((n, n), dt_mask),     # mask grad: DCE'd upstream
            dw2.astype(dt_w2), db2.reshape(-1).astype(dt_b2),
            dwg.reshape(-1, 1).astype(dt_wg),
            dbg.reshape(1).astype(dt_bg))


def _gn_fwd_rule(p_i, p_j, mask, w2, b2, wg, bg, activation, interpret):
    return _gn_fwd(p_i, p_j, mask, w2, b2, wg, bg, activation,
                   interpret)


gn_allpairs_aggregate.defvjp(_gn_fwd_rule, _gn_bwd)


def gn_allpairs_reference(p_i, p_j, mask, w2, b2, wg, bg,
                          activation: str = "silu"):
    """Pure-jnp oracle (small N only: materializes [B, N, N, h])."""
    act, _ = ACTIVATIONS[activation]
    s = p_i[..., :, None, :] + p_j[..., None, :, :]
    mb = act(act(s) @ w2 + b2)
    g = jax.nn.sigmoid(mb @ wg + bg)
    keep = (mask != 0).astype(jnp.float32)
    return jnp.einsum("ij,...ijh->...ih", keep,
                      (g * mb).astype(jnp.float32))

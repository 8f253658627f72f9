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
gets from ``jax.checkpoint``, but in VMEM): one pass over (dst-block,
src-block) accumulates d_pi and the four weight grads; a second pass
with src/dst roles swapped (and the mask transposed) accumulates
d_pj. Weight-gradient tiles accumulate in a constant-index f32 output
block across the whole sequential grid.
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


ACTIVATIONS = {
    "silu": (_silu, _dsilu),
    "swish": (_silu, _dsilu),
    "tanh": (jnp.tanh, _dtanh),
    "relu": (jax.nn.relu, _drelu),
    "elu": (jax.nn.elu, _delu),
}

# fwd dst-rows per grid step / bwd rows per step (cols are always 128
# lanes). Bwd holds ~8 live [ch, BR, 128] tiles -> smaller rows.
_FWD_BI = 128
_BWD_BR = 64
_BLK_J = 128


def _pad_to(x, mult: int, axis: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(act, piT_ref, pjT_ref, mask_ref, w2_ref, b2_ref,
                wg_ref, bg_ref, out_ref):
    j = pl.program_id(2)
    pi = piT_ref[0]                                   # [h2, BI]
    pj = pjT_ref[0]                                   # [h2, BJ]
    t = act(pi[:, :, None] + pj[:, None, :])          # [h2, BI, BJ]
    # mt[h, BI, BJ] = w2^T contracted with t over h2
    mt = lax.dot_general(w2_ref[:], t, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mb = act(mt + b2_ref[0][:, None, None])           # [h, BI, BJ] f32
    gz = lax.dot_general(wg_ref[:], mb, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])             # [1, BI, BJ]
    gmb = (g * mb).astype(pi.dtype)
    # agg[BI, h] = sum_j mask[i, j] * gmb[h, i, j]
    agg = lax.dot_general(gmb, mask_ref[:].astype(gmb.dtype),
                          (((2,), (1,)), ((1,), (0,))),
                          preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += agg


def _bwd_kernel(act, dact, row_is_dst: bool, aT_ref, bT_ref, mask_ref,
                w2_ref, b2_ref, wg_ref, bg_ref, ghatT_ref, drow_ref,
                *wgrad_refs):
    bi, r, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    a = aT_ref[0]                                     # [h2, BR]
    b = bT_ref[0]                                     # [h2, BC]
    s = a[:, :, None] + b[:, None, :]                 # [h2, BR, BC]
    t = act(s)
    mt = lax.dot_general(w2_ref[:], t, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mt = mt + b2_ref[0][:, None, None]                # [h, BR, BC]
    mb = act(mt)
    gz = lax.dot_general(wg_ref[:], mb, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])             # [1, BR, BC]
    ghat = ghatT_ref[0].astype(jnp.float32)           # [h, BR or BC]
    if row_is_dst:  # rows are dst: ghat indexed by row
        e = mask_ref[:].astype(jnp.float32)[None] * ghat[:, :, None]
    else:           # rows are src: ghat indexed by col (mask pre-T)
        e = mask_ref[:].astype(jnp.float32)[None] * ghat[:, None, :]
    dgz = jnp.sum(e * mb, axis=0, keepdims=True) * g * (1.0 - g)
    dmb = e * g + dgz * wg_ref[0][:, None, None]      # [h, BR, BC]
    dmt = dmb * dact(mt)
    # dt[h2, BR, BC] = w2 contracted with dmt over h
    dt = lax.dot_general(w2_ref[:], dmt, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = dt * dact(s).astype(jnp.float32)
    drow = jnp.sum(ds, axis=2).astype(jnp.float32)    # [h2, BR]

    @pl.when(c == 0)
    def _():
        drow_ref[0] = jnp.zeros_like(drow_ref[0])

    drow_ref[0] += drow

    if row_is_dst:
        dw2_ref, db2_ref, dwg_ref, dbg_ref = wgrad_refs
        # dw2[h2, h] = t contracted with dmt over the (BR, BC) pairs
        dw2 = lax.dot_general(t.astype(jnp.float32), dmt,
                              (((1, 2), (1, 2)), ((), ())),
                              preferred_element_type=jnp.float32)
        db2 = jnp.sum(dmt, axis=(1, 2))[None]         # [1, h]
        dwg = jnp.sum(mb * dgz, axis=(1, 2))[None]    # [1, h]
        dbg = jnp.sum(dgz)[None, None]                # [1, 1]

        first = (bi == 0) & (r == 0) & (c == 0)

        @pl.when(first)
        def _():
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dwg_ref[:] = jnp.zeros_like(dwg_ref)
            dbg_ref[:] = jnp.zeros_like(dbg_ref)

        dw2_ref[:] += dw2
        db2_ref[:] += db2
        dwg_ref[:] += dwg
        dbg_ref[:] += dbg


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
        functools.partial(_fwd_kernel, act),
        out_shape=jax.ShapeDtypeStruct((bsz, npad, h), jnp.float32),
        grid=grid,
        in_specs=_node_specs(h2, _FWD_BI, _BLK_J) + _weight_specs(h2, h),
        out_specs=pl.BlockSpec((1, _FWD_BI, h), lambda b, r, c: (b, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * npad * npad * h2 * h,
            bytes_accessed=mask.size * mask.dtype.itemsize
            + 2 * piT.size * piT.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=bsz * npad * npad * (h2 + h + 1)),
    )(piT, pjT, mask, w2, b2, wgr, bgr)
    return out


def _bwd_call(aT, bT, mask, w2, b2, wgr, bgr, ghatT, row_is_dst: bool,
              act_name: str, interpret: bool):
    act, dact = ACTIVATIONS[act_name]
    bsz, h2, npad = aT.shape
    h = w2.shape[1]
    br, bc = _BWD_BR, _BLK_J
    grid = (bsz, npad // br, npad // bc)
    ghat_spec = pl.BlockSpec(
        (1, h, br if row_is_dst else bc),
        (lambda b, r, c: (b, 0, r)) if row_is_dst
        else (lambda b, r, c: (b, 0, c)),
        memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((bsz, h2, npad), jnp.float32)]
    out_specs = [pl.BlockSpec((1, h2, br), lambda b, r, c: (b, 0, r),
                              memory_space=pltpu.VMEM)]
    if row_is_dst:
        full = lambda b, r, c: (0, 0)
        out_shapes += [jax.ShapeDtypeStruct((h2, h), jnp.float32),
                       jax.ShapeDtypeStruct((1, h), jnp.float32),
                       jax.ShapeDtypeStruct((1, h), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)]
        out_specs += [pl.BlockSpec(sh, full, memory_space=pltpu.VMEM)
                      for sh in ((h2, h), (1, h), (1, h), (1, 1))]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, act, dact, row_is_dst),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=_node_specs(h2, br, bc) + _weight_specs(h2, h)
        + [ghat_spec],
        out_specs=tuple(out_specs),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * bsz * npad * npad * h2 * h,
            bytes_accessed=2 * mask.size * mask.dtype.itemsize
            + 2 * aT.size * aT.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=3 * bsz * npad * npad * (h2 + h + 1)),
    )(aT, bT, mask, w2, b2, wgr, bgr, ghatT)
    return outs


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
    piT = _pad_to(jnp.swapaxes(p_i, -1, -2), mult, 2)
    pjT = _pad_to(jnp.swapaxes(p_j, -1, -2), mult, 2)
    maskp = _pad_to(_pad_to(mask, mult, 0), mult, 1)
    return piT, pjT, maskp, n


def _gn_fwd(p_i, p_j, mask, w2, b2, wg, bg, activation, interpret):
    piT, pjT, maskp, n = _prep(p_i, p_j, mask)
    cd = piT.dtype
    maskb = (maskp != 0).astype(cd)
    w2c = w2.astype(cd)
    b2r = b2.astype(jnp.float32).reshape(1, -1)
    wgr = wg.astype(cd).reshape(1, -1)
    bgr = bg.astype(jnp.float32).reshape(1, 1)
    out = _fwd_call(piT, pjT, maskb, w2c, b2r, wgr, bgr, activation,
                    interpret)[:, :n]
    # zero-size protos carry the primal dtypes (bwd outputs must match
    # the primal avals; dtype objects aren't valid pytree leaves)
    protos = tuple(jnp.zeros((0,), a.dtype)
                   for a in (mask, w2, b2, wg, bg))
    return out, (piT, pjT, maskb, w2c, b2r, wgr, bgr, protos, n)


def _gn_bwd(activation, interpret, res, ghat):
    piT, pjT, maskb, w2c, b2r, wgr, bgr, protos, n = res
    npad = piT.shape[-1]
    ghatT = jnp.swapaxes(ghat, -1, -2)
    if npad != n:
        ghatT = jnp.pad(ghatT, ((0, 0), (0, 0), (0, npad - n)))
    ghatT = ghatT.astype(piT.dtype)
    dpiT, dw2, db2, dwg, dbg = _bwd_call(
        piT, pjT, maskb, w2c, b2r, wgr, bgr, ghatT, True, activation,
        interpret)
    (dpjT,) = _bwd_call(
        pjT, piT, jnp.swapaxes(maskb, 0, 1), w2c, b2r, wgr, bgr, ghatT,
        False, activation, interpret)
    dpi = jnp.swapaxes(dpiT, -1, -2)[:, :n]
    dpj = jnp.swapaxes(dpjT, -1, -2)[:, :n]
    dt_mask, dt_w2, dt_b2, dt_wg, dt_bg = (p.dtype for p in protos)
    return (dpi.astype(piT.dtype), dpj.astype(pjT.dtype),
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

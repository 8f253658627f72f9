"""Fused Pallas TPU kernel for GatedGN ELL (padded-neighbor) messages.

The sparse GatedGN rows (Table 2's 100-nn graphs; reference
``tsl/nn/layers/graph_convs/gated_gn.py:9-64``) are HBM-bandwidth
bound in the blocked-XLA ELL path: per layer it materializes the
``[B, N, D, h]`` message tensor repeatedly (post-``d_msg``, the gate,
the product) — several full HBM round-trips of 64-wide intermediates
(measured 1.2% MFU at PV-US scale), while the raw neighbor gather
itself is cheap (measured 565M rows/s — NOT the bottleneck). The
irreducible input is the gathered projection ``p_j[src_idx]`` at half
width (h2); everything downstream is a per-pair chain::

    s   = p_i[dst] + p_j[src]          # [h2]
    t   = act(s)
    mb  = act(t @ w2 + b2)             # [h]
    g   = sigmoid(mb @ wg + bg)        # scalar gate
    agg[dst] = sum_j nmask * g * mb    # over the D padded neighbors

This kernel keeps the whole chain in VMEM: XLA performs the gather
(and one cheap [B, ND, h2] -> [B, h2, ND] transpose), the kernel reads
the result once and writes only the ``[B, h, N]`` aggregate.

Layout: CHANNELS-ON-SUBLANES, pairs on lanes (the ``gn_allpairs.py``
layout) — per-pair columns tile the full 128-lane VPU/MXU, so the
transcendental-heavy activation/gate chain pays no lane padding (the
first pairs-major version wasted 4x the VPU on h2=32 lanes and its
backward fit only 16-node VMEM blocks; measured 0.6x of the XLA path).

Backward (``jax.custom_vjp``): ONE recompute pass per tile emitting
d_piT (neighbor-summed in VMEM), d_pjnT (the gather's cotangent —
XLA's gather VJP scatter-adds it into d_p_j), and the four weight
grads accumulated in constant-index f32 blocks across the grid.

Gated in ``models/graph_layers.py`` behind ``ELL_PALLAS``; the
blocked-XLA path is the DEFAULT and the edge-list oracle the parity
reference (``tests/test_gn_ell.py``). Real-chip verdict (bench r5,
PV-US 100-nn, batch 5): this channels-major version reaches 0.83x of
the blocked-XLA step (v1 pairs-major: 0.60x) — the backward's 3x
per-pair transcendental recompute outweighs the HBM round-trips it
saves, so the kernel stays opt-in; the bench re-measures both every
run (``gn_ell_pallas_vs_xla_speedup``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgp_tpu.ops.gn_allpairs import ACTIVATIONS

_BN = 32          # dst nodes per grid step (fwd AND bwd)
# neighbor-dim padding: D must be a LANE multiple (128) — Mosaic's
# vector layout cannot merge/split a non-128 minor dim (measured
# "unsupported shape cast" at D=112), and the in-kernel
# [h2, BN, D] <-> [h2, BN*D] reshapes rely on it. Costs up to 28%
# extra gather/read on a 100-nn graph; still ~5x less traffic than
# the blocked-XLA path's message round-trips.
_D_MULT = 128


def _pad_axis(x, mult: int, axis: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _chain(act, bn, d, piN_ref, pjnT_ref, mask_ref, w2_ref, b2_ref,
           wg_ref, bg_ref):
    """Shared fwd recompute: returns (s, t2, mt, mb, g, maskf).

    Node blocks arrive in NATURAL [1, BN, h2] layout (Mosaic only
    slices the minor dim in 128-multiples, so a [1, h2, N] layout
    could not be cut into BN=32 lane chunks); channels move to
    sublanes via a tiny per-tile transpose — same trick as
    ``gn_allpairs._bwd_kernel``."""
    h2 = piN_ref.shape[-1]
    h = w2_ref.shape[1]
    cdt = piN_ref.dtype
    p = bn * d
    pi = jnp.transpose(piN_ref[0]).astype(jnp.float32)  # [h2, BN]
    pjn = pjnT_ref[0].astype(jnp.float32)               # [h2, BN*D]
    s = (pi[:, :, None] + pjn.reshape(h2, bn, d)).reshape(h2, p)
    t2 = act(s).astype(cdt)                             # [h2, P]
    mt = lax.dot_general(w2_ref[:], t2, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mt = mt + b2_ref[:].reshape(h, 1)                   # [h, P] f32
    mb = act(mt)
    gz = lax.dot_general(wg_ref[:], mb, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])               # [1, P]
    maskf = mask_ref[:].astype(jnp.float32)             # [1, P]
    return s, t2, mt, mb, g, maskf


def _fwd_kernel(act, bn: int, d: int, piN_ref, pjnT_ref, mask_ref,
                w2_ref, b2_ref, wg_ref, bg_ref, outN_ref):
    h = w2_ref.shape[1]
    _, _, _, mb, g, maskf = _chain(act, bn, d, piN_ref, pjnT_ref,
                                   mask_ref, w2_ref, b2_ref, wg_ref,
                                   bg_ref)
    gmb = ((g * maskf) * mb).reshape(h, bn, d)
    outN_ref[0] = jnp.transpose(jnp.sum(gmb, axis=2))   # [BN, h]


def _bwd_kernel(act, dact, bn: int, d: int, piN_ref, pjnT_ref,
                mask_ref, w2_ref, b2_ref, wg_ref, bg_ref, ghatN_ref,
                dpiN_ref, dpjnT_ref, dw2_ref, db2_ref, dwg_ref,
                dbg_ref):
    b_i, r = pl.program_id(0), pl.program_id(1)
    h2 = piN_ref.shape[-1]
    h = w2_ref.shape[1]
    cdt = piN_ref.dtype
    p = bn * d
    s, t2, mt, mb, g, maskf = _chain(act, bn, d, piN_ref, pjnT_ref,
                                     mask_ref, w2_ref, b2_ref, wg_ref,
                                     bg_ref)
    ghat = jnp.transpose(ghatN_ref[0]).astype(jnp.float32)  # [h, BN]
    # cotangent of (g*mb) at each pair = mask * ghat[dst]
    e = (ghat[:, :, None] * jnp.ones((1, 1, d), jnp.float32)
         ).reshape(h, p) * maskf                        # [h, P]
    dgz = jnp.sum(e * mb, axis=0, keepdims=True) * g * (1.0 - g)
    dmb = e * g + wg_ref[:].astype(jnp.float32).reshape(h, 1) * dgz
    dmt = dmb * dact(mt)                                # [h, P] f32
    dt = lax.dot_general(w2_ref[:], dmt.astype(cdt),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = dt * dact(s)                                   # [h2, P]
    dpjnT_ref[0] = ds.astype(dpjnT_ref.dtype)
    dpiN_ref[0] = jnp.transpose(
        jnp.sum(ds.reshape(h2, bn, d), axis=2))         # [BN, h2]

    @pl.when((b_i == 0) & (r == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)

    dw2_ref[:] += lax.dot_general(t2, dmt.astype(cdt),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dmt, axis=1, keepdims=True)       # [h, 1]
    dwg_ref[:] += jnp.sum(mb * dgz, axis=1, keepdims=True)  # [h, 1]
    dbg_ref[:] += jnp.sum(dgz)[None, None]


def _weight_specs(h2: int, h: int):
    full = lambda b, r: (0, 0)
    return [
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM),
    ]


def _in_specs(h2: int, d: int):
    return [
        # pi natural [1, BN, h2]: full minor dim (lane slicing must be
        # 128-aligned; BN=32 is not) — transposed in-kernel
        pl.BlockSpec((1, _BN, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        # pjnT minor slices are BN*D (a 128-multiple via _D_MULT)
        pl.BlockSpec((1, h2, _BN * d), lambda b, r: (b, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _BN * d), lambda b, r: (0, r),
                     memory_space=pltpu.VMEM),
    ]


def _fwd_call(piN, pjnT, mask, w2, b2, wgr, bgr, act_name, interpret):
    act, _ = ACTIVATIONS[act_name]
    bsz, npad, h2 = piN.shape
    d = pjnT.shape[-1] // npad
    h = w2.shape[1]
    grid = (bsz, npad // _BN)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act, _BN, d),
        out_shape=jax.ShapeDtypeStruct((bsz, npad, h), jnp.float32),
        grid=grid,
        in_specs=_in_specs(h2, d) + _weight_specs(h2, h),
        out_specs=pl.BlockSpec((1, _BN, h), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * npad * d * h2 * h,
            bytes_accessed=pjnT.size * pjnT.dtype.itemsize
            + piN.size * piN.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=bsz * npad * d * (h2 + h + 1)),
    )(piN, pjnT, mask, w2, b2, wgr, bgr)


def _bwd_call(piN, pjnT, mask, w2, b2, wgr, bgr, ghatN, act_name,
              interpret):
    act, dact = ACTIVATIONS[act_name]
    bsz, npad, h2 = piN.shape
    d = pjnT.shape[-1] // npad
    h = w2.shape[1]
    grid = (bsz, npad // _BN)
    ghat_spec = pl.BlockSpec((1, _BN, h), lambda b, r: (b, r, 0),
                             memory_space=pltpu.VMEM)
    full = lambda b, r: (0, 0)
    out_shapes = (
        jax.ShapeDtypeStruct((bsz, npad, h2), jnp.float32),
        jax.ShapeDtypeStruct((bsz, h2, npad * d), pjnT.dtype),
        jax.ShapeDtypeStruct((h2, h), jnp.float32),
        jax.ShapeDtypeStruct((h, 1), jnp.float32),
        jax.ShapeDtypeStruct((h, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs = (
        pl.BlockSpec((1, _BN, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h2, _BN * d), lambda b, r: (b, 0, r),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, act, dact, _BN, d),
        out_shape=out_shapes,
        grid=grid,
        in_specs=_in_specs(h2, d) + _weight_specs(h2, h) + [ghat_spec],
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * npad * d * h2 * h,
            bytes_accessed=2 * pjnT.size * pjnT.dtype.itemsize
            + piN.size * piN.dtype.itemsize + 8 * bsz * npad * h,
            transcendentals=3 * bsz * npad * d * (h2 + h + 1)),
    )(piN, pjnT, mask, w2, b2, wgr, bgr, ghatN)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gn_ell_aggregate(p_i, pjn, nmask, w2, b2, wg, bg,
                     activation: str = "silu",
                     interpret: bool = False):
    """Fused gated ELL message aggregation.

    Args:
      p_i: ``[B, N, h2]`` dst-side projections.
      pjn: ``[B, N, D, h2]`` GATHERED src-side projections
        (``p_j[src_idx]`` from ``padded_incoming``'s layout). Produced
        by an XLA gather so its VJP (scatter-add into d_p_j) is
        automatic.
      nmask: ``[N, D]`` neighbor validity (0 = padding). Treated as
        non-differentiable (hard-zero cotangent).
      w2, b2, wg, bg: second edge-MLP layer + gate layer params.
      activation: one of ``gn_allpairs.ACTIVATIONS``.
      interpret: Pallas interpreter (CPU tests).

    Returns: ``[B, N, h]`` float32 aggregated messages.
    """
    out, _ = _gn_ell_fwd(p_i, pjn, nmask, w2, b2, wg, bg, activation,
                         interpret)
    return out


def _prep(p_i, pjn, nmask):
    """Pad (N -> _BN mult, D -> _D_MULT mult) and transpose to the
    kernel's channels-major layout."""
    b, n, d, h2 = pjn.shape
    d_pad = -(-d // _D_MULT) * _D_MULT
    n_pad = -(-n // _BN) * _BN
    pi_p = _pad_axis(p_i, _BN, 1)                      # [B, Np, h2]
    pjn_p = _pad_axis(_pad_axis(pjn, _D_MULT, 2), _BN, 1)
    mask_p = _pad_axis(_pad_axis(nmask, _D_MULT, 1), _BN, 0)
    pjnT = jnp.swapaxes(pjn_p.reshape(b, n_pad * d_pad, h2), -1, -2)
    maskr = mask_p.reshape(1, n_pad * d_pad)
    return pi_p, pjnT, maskr, n, d_pad


def _gn_ell_fwd(p_i, pjn, nmask, w2, b2, wg, bg, activation,
                interpret):
    cd = pjn.dtype
    piN, pjnT, maskr, n, d_pad = _prep(p_i.astype(cd), pjn, nmask)
    maskb = (maskr != 0).astype(jnp.float32)
    w2c = w2.astype(cd)
    b2r = b2.astype(jnp.float32).reshape(1, -1)
    wgr = wg.astype(cd).reshape(1, -1)
    bgr = bg.astype(jnp.float32).reshape(1, 1)
    out = _fwd_call(piN, pjnT, maskb, w2c, b2r, wgr, bgr, activation,
                    interpret)[:, :n]                  # [B, N, h]
    protos = tuple(jnp.zeros((0,), a.dtype)
                   for a in (p_i, pjn, nmask, w2, b2, wg, bg))
    return out, (piN, pjnT, maskb, w2c, b2r, wgr, bgr, protos, n,
                 nmask.shape[1], d_pad)


def _gn_ell_bwd(activation, interpret, res, ghat):
    (piN, pjnT, maskb, w2c, b2r, wgr, bgr, protos, n, d, d_pad) = res
    bsz, npad, h2 = piN.shape
    ghat_p = ghat if npad == n else jnp.pad(
        ghat, ((0, 0), (0, npad - n), (0, 0)))
    dpiN, dpjnT, dw2, db2, dwg, dbg = _bwd_call(
        piN, pjnT, maskb, w2c, b2r, wgr, bgr,
        ghat_p.astype(jnp.float32), activation, interpret)
    (pt_pi, pt_pjn, pt_mask, pt_w2, pt_b2, pt_wg, pt_bg) = protos
    dpi = dpiN[:, :n]
    dpjn = jnp.swapaxes(dpjnT, -1, -2).reshape(
        bsz, npad, d_pad, h2)[:, :n, :d]
    return (dpi.astype(pt_pi.dtype),
            dpjn.astype(pt_pjn.dtype),
            jnp.zeros((n, d), pt_mask.dtype),   # mask: non-diff
            dw2.astype(pt_w2.dtype),
            db2.reshape(-1).astype(pt_b2.dtype),
            dwg.reshape(-1, 1).astype(pt_wg.dtype),
            dbg.reshape(1).astype(pt_bg.dtype))


def _gn_ell_fwd_rule(p_i, pjn, nmask, w2, b2, wg, bg, activation,
                     interpret):
    return _gn_ell_fwd(p_i, pjn, nmask, w2, b2, wg, bg, activation,
                       interpret)


gn_ell_aggregate.defvjp(_gn_ell_fwd_rule, _gn_ell_bwd)


def gn_ell_reference(p_i, pjn, nmask, w2, b2, wg, bg,
                     activation: str = "silu"):
    """Pure-jnp oracle (the blocked-XLA ELL math)."""
    act, _ = ACTIVATIONS[activation]
    s = p_i[..., :, None, :] + pjn
    mb = act(act(s) @ w2 + b2)
    g = jax.nn.sigmoid(mb @ wg.reshape(-1, 1) + bg)
    m = g * mb
    return jnp.sum((m * nmask[..., None]).astype(jnp.float32), axis=-2)

"""Fused Pallas TPU kernel for GatedGN ELL (padded-neighbor) messages.

The sparse GatedGN rows (Table 2's 100-nn graphs; reference
``tsl/nn/layers/graph_convs/gated_gn.py:9-64``) are HBM-bandwidth
bound in the blocked-XLA ELL path: per layer it materializes the
``[B, N, D, h]`` message tensor TWICE (post-``d_msg`` and post-gate)
plus the gate — ~3 full HBM round-trips of 64-wide intermediates
(measured 1.2% MFU at PV-US scale). The irreducible input is the
gathered neighbor projection ``p_j[src_idx]`` at HALF width (h2 = 32);
everything downstream of it is a per-pair chain::

    s   = p_i[dst] + p_j[src]          # [h2]
    t   = act(s)
    mb  = act(t @ w2 + b2)             # [h]
    g   = sigmoid(mb @ wg + bg)        # scalar gate
    agg[dst] = sum_j nmask * g * mb    # over the D padded neighbors

This kernel keeps that whole chain in VMEM: XLA performs the (wide-row,
latency-bound, unavoidable) gather into ``[B, N*D, h2]`` bf16 once, and
the kernel reads it a single time, writing only the ``[B, N, h]``
aggregate — per-layer HBM traffic drops from ~3x ``P*h`` tensors to
one ``P*h2`` read (~6x fewer bytes).

Layout: pairs-major (``[BN*D, h2]`` tiles, channels on lanes) — the
gathered input arrives in exactly this layout, so no transposes touch
HBM. The h2=32 / h=64 lane counts underfill the 128-lane VPU/MXU, but
the path is bandwidth-bound, not compute-bound (the MXU work per byte
read is ~h=64 flops).

Backward (``jax.custom_vjp``): recomputes the forward tiles (nothing
per-pair is stored) in ONE pass, emitting d_pi (neighbor-summed in
VMEM), d_pjn (the gather's cotangent, bf16 — XLA's gather VJP
scatter-adds it into d_p_j), and the four weight grads accumulated in
constant-index f32 blocks across the sequential grid.

Gated in ``models/graph_layers.py`` behind ``ELL_PALLAS`` (measured
default), with the blocked-XLA path as the fallback and the edge-list
oracle as the parity reference (``tests/test_gn_ell.py``).
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

_BN = 64          # dst nodes per fwd grid step
# the bwd holds ~9 [BN*D, h] f32 temporaries at once — a 64-node block
# at D~112 is ~37 MB of scoped VMEM (measured Mosaic stack OOM over
# the 16 MB limit); 16 nodes keeps it ~9 MB
_BN_BWD = 16
_D_MULT = 16      # neighbor-dim padding (bf16 sublane tile)


def _pad_axis(x, mult: int, axis: int):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(act, bn: int, d: int, pi_ref, pjn_ref, mask_ref,
                w2_ref, b2_ref, wg_ref, bg_ref, out_ref):
    h2 = pi_ref.shape[-1]
    h = w2_ref.shape[1]
    cdt = pi_ref.dtype
    pi = pi_ref[0].astype(jnp.float32)                 # [BN, h2]
    pjn = pjn_ref[0].astype(jnp.float32)               # [BN*D, h2]
    s = pi.reshape(bn, 1, h2) + pjn.reshape(bn, d, h2)
    t = act(s).reshape(bn * d, h2).astype(cdt)         # [P, h2]
    mt = lax.dot_general(t, w2_ref[:], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mb = act(mt + b2_ref[:])                           # [P, h] f32
    gz = lax.dot_general(mb.astype(cdt), wg_ref[:].astype(cdt),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])              # [P, 1]
    gmb = (g * mb).reshape(bn, d, h)
    agg = jnp.sum(gmb * mask_ref[:].astype(jnp.float32)[:, :, None],
                  axis=1)                              # [BN, h]
    out_ref[0] = agg


def _bwd_kernel(act, dact, bn: int, d: int, pi_ref, pjn_ref, mask_ref,
                w2_ref, b2_ref, wg_ref, bg_ref, ghat_ref,
                dpi_ref, dpjn_ref, dw2_ref, db2_ref, dwg_ref, dbg_ref):
    b_i, r = pl.program_id(0), pl.program_id(1)
    h2 = pi_ref.shape[-1]
    h = w2_ref.shape[1]
    cdt = pi_ref.dtype
    p = bn * d
    pi = pi_ref[0].astype(jnp.float32)
    pjn = pjn_ref[0].astype(jnp.float32)
    s = (pi.reshape(bn, 1, h2) + pjn.reshape(bn, d, h2)).reshape(p, h2)
    t = act(s).astype(cdt)
    mt = lax.dot_general(t, w2_ref[:], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    mt = mt + b2_ref[:]
    mb = act(mt)                                       # [P, h] f32
    gz = lax.dot_general(mb.astype(cdt), wg_ref[:].astype(cdt),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    g = jax.nn.sigmoid(gz + bg_ref[0, 0])              # [P, 1]
    maskf = mask_ref[:].astype(jnp.float32)            # [BN, D]
    ghat = ghat_ref[0].astype(jnp.float32)             # [BN, h]
    e = (ghat.reshape(bn, 1, h) * maskf[:, :, None]).reshape(p, h)
    dgz = jnp.sum(e * mb, axis=1, keepdims=True) * g * (1.0 - g)
    dmb = e * g + dgz * wg_ref[:].astype(jnp.float32).reshape(1, h)
    dmt = dmb * dact(mt)                               # [P, h] f32
    dt = lax.dot_general(dmt.astype(cdt), w2_ref[:],
                         (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    ds = dt * dact(s)                                  # [P, h2] f32
    dpjn_ref[0] = ds.astype(dpjn_ref.dtype)
    dpi_ref[0] = jnp.sum(ds.reshape(bn, d, h2), axis=1)

    @pl.when((b_i == 0) & (r == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dwg_ref[:] = jnp.zeros_like(dwg_ref)
        dbg_ref[:] = jnp.zeros_like(dbg_ref)

    dw2_ref[:] += lax.dot_general(t, dmt.astype(cdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dmt, axis=0, keepdims=True)      # [1, h]
    dwg_ref[:] += jnp.sum(mb * dgz, axis=0, keepdims=True)  # [1, h]
    dbg_ref[:] += jnp.sum(dgz)[None, None]


def _weight_specs(h2: int, h: int):
    full = lambda b, r: (0, 0)
    return [
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM),
    ]


def _in_specs(h2: int, d: int, bn: int = _BN):
    return [
        pl.BlockSpec((1, bn, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn * d, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, d), lambda b, r: (r, 0),
                     memory_space=pltpu.VMEM),
    ]


def _fwd_call(pi, pjn, mask, w2, b2, wgr, bgr, act_name, interpret):
    act, _ = ACTIVATIONS[act_name]
    bsz, npad, h2 = pi.shape
    d = mask.shape[1]
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
            bytes_accessed=pjn.size * pjn.dtype.itemsize
            + pi.size * pi.dtype.itemsize + 4 * bsz * npad * h,
            transcendentals=bsz * npad * d * (h2 + h + 1)),
    )(pi, pjn, mask, w2, b2, wgr, bgr)


def _bwd_call(pi, pjn, mask, w2, b2, wgr, bgr, ghat, act_name,
              interpret):
    act, dact = ACTIVATIONS[act_name]
    bsz, npad, h2 = pi.shape
    d = mask.shape[1]
    h = w2.shape[1]
    bn = _BN_BWD
    grid = (bsz, npad // bn)
    ghat_spec = pl.BlockSpec((1, bn, h), lambda b, r: (b, r, 0),
                             memory_space=pltpu.VMEM)
    full = lambda b, r: (0, 0)
    out_shapes = (
        jax.ShapeDtypeStruct((bsz, npad, h2), jnp.float32),
        jax.ShapeDtypeStruct((bsz, npad * d, h2), pjn.dtype),
        jax.ShapeDtypeStruct((h2, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32))
    out_specs = (
        pl.BlockSpec((1, bn, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn * d, h2), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h2, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, act, dact, bn, d),
        out_shape=out_shapes,
        grid=grid,
        in_specs=_in_specs(h2, d, bn) + _weight_specs(h2, h)
        + [ghat_spec],
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * npad * d * h2 * h,
            bytes_accessed=2 * pjn.size * pjn.dtype.itemsize
            + pi.size * pi.dtype.itemsize + 8 * bsz * npad * h,
            transcendentals=3 * bsz * npad * d * (h2 + h + 1)),
    )(pi, pjn, mask, w2, b2, wgr, bgr, ghat)


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
    b, n, d, h2 = pjn.shape
    d_pad = -(-d // _D_MULT) * _D_MULT
    n_pad = -(-n // _BN) * _BN
    pi_p = _pad_axis(p_i, _BN, 1)
    pjn_p = _pad_axis(_pad_axis(pjn, _D_MULT, 2), _BN, 1)
    mask_p = _pad_axis(_pad_axis(nmask, _D_MULT, 1), _BN, 0)
    return (pi_p, pjn_p.reshape(b, n_pad * d_pad, h2), mask_p, n,
            d_pad)


def _gn_ell_fwd(p_i, pjn, nmask, w2, b2, wg, bg, activation,
                interpret):
    cd = pjn.dtype
    pi_p, pjn_p, mask_p, n, d_pad = _prep(p_i.astype(cd), pjn, nmask)
    maskb = (mask_p != 0).astype(cd)
    w2c = w2.astype(cd)
    b2r = b2.astype(jnp.float32).reshape(1, -1)
    wgr = wg.astype(jnp.float32).reshape(-1, 1)
    bgr = bg.astype(jnp.float32).reshape(1, 1)
    out = _fwd_call(pi_p, pjn_p, maskb, w2c, b2r, wgr, bgr, activation,
                    interpret)[:, :n]
    protos = tuple(jnp.zeros((0,), a.dtype)
                   for a in (p_i, pjn, nmask, w2, b2, wg, bg))
    return out, (pi_p, pjn_p, maskb, w2c, b2r, wgr, bgr, protos, n,
                 nmask.shape[1], d_pad)


def _gn_ell_bwd(activation, interpret, res, ghat):
    (pi_p, pjn_p, maskb, w2c, b2r, wgr, bgr, protos, n, d, d_pad) = res
    bsz, npad, h2 = pi_p.shape
    ghat_p = ghat if npad == n else jnp.pad(
        ghat, ((0, 0), (0, npad - n), (0, 0)))
    ghat_p = ghat_p.astype(jnp.float32)
    dpi, dpjn, dw2, db2, dwg, dbg = _bwd_call(
        pi_p, pjn_p, maskb, w2c, b2r, wgr, bgr, ghat_p, activation,
        interpret)
    (pt_pi, pt_pjn, pt_mask, pt_w2, pt_b2, pt_wg, pt_bg) = protos
    dpjn = dpjn.reshape(bsz, npad, d_pad, h2)[:, :n, :d]
    return (dpi[:, :n].astype(pt_pi.dtype),
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

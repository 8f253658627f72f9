"""Boundary halo exchange for node-sharded K-hop propagation.

SURVEY.md §5.8: partition the node dimension 1-D over a mesh axis; per
hop, exchange ONLY the boundary rows each shard's in-edges reference on
other shards (``all_to_all`` over ICI), instead of all-gathering the
full ``[N, F]`` activation. With a locality-preserving node order (RCM,
:func:`sgp_tpu.graph.sparse.rcm_order`) the exchanged bytes per hop are
``S * B_max * F`` per device with ``B_max ≪ N``.

Everything static-shape: boundary index sets are precomputed on host,
padded to the max per-peer count, and shipped as per-shard constants
(stacked ``[S, ...]`` arrays sharded over the axis so each device reads
its own slice). The device-side hop is

    out_local = A_local @ x_local + A_halo @ all_to_all(x_local[send_idx])

with the local block matmul overlapping the collective.

The per-shard operator blocks come in three representations so the plan
scales past small graphs (the round-2 version materialized dense
``[Nl, Nl]`` / ``[Nl, S*B]`` blocks — O(N²/S) per device, which dies
exactly where multi-chip is needed):

- ``dense``: the diagonal block as a dense matrix; one MXU matmul.
  Right for small shards (the reference benchmark graphs).
- ``bsr``: the diagonal block packed into 128×128 tiles at nonzero
  block positions; compute is a batched block matmul + block-row
  ``segment_sum`` (XLA-native block-sparse SpMM, MXU-aligned). Plan
  memory O(stored blocks) — with RCM ordering that is O(E/S) per
  device. Halo entries are COO (they are few by construction).
- ``coo``: both blocks as gather + ``segment_sum`` — the O(E) oracle.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgp_tpu.graph.sparse import Graph

_BLOCK = 128


@dataclasses.dataclass
class HaloSpec:
    """Host-built halo-exchange plan for a 1-D node partition.

    Arrays are stacked per-shard (leading dim ``S``) so that sharding
    them over the mesh axis hands each device exactly its own slice.

    - ``local``: the diagonal (local->local) block of each shard's rows
      of ``A``, representation per ``mode``:
      dense ``(a_local [S, Nl, Nl],)``;
      bsr ``(blocks [S, nb, 128, 128], brows [S, nb], bcols [S, nb])``;
      coo ``(src [S, E], dst [S, E], w [S, E])`` (zero-weight padding).
    - ``halo``: the off-diagonal entries, columns remapped to the recv
      layout (peer-``j`` section ``j*B:(j+1)*B`` = the values this
      shard needs from peer ``j``): dense ``(a_halo [S, Nl, S*B],)``;
      otherwise COO ``(hsrc [S, Eh], hdst [S, Eh], hw [S, Eh])`` with
      ``hsrc`` indexing the ``S*B`` recv buffer.
    - ``send_idx [S, S, B]``: on device ``i``, slot ``j`` holds the
      LOCAL indices of the rows peer ``j`` needs from ``i`` (pad 0).
    """
    mode: str
    local: Tuple[jnp.ndarray, ...]
    halo: Tuple[jnp.ndarray, ...]
    send_idx: jnp.ndarray
    n_shards: int
    nodes_per_shard: int
    num_nodes: int            # true N (<= S * Nl; rest is padding)
    b_max: int
    boundary_counts: np.ndarray   # [S, S] true per-pair boundary sizes

    def bytes_per_hop(self, feat: int, itemsize: int = 4) -> int:
        """Bytes exchanged per device per hop (send buffer size)."""
        return self.n_shards * self.b_max * feat * itemsize

    def dense_gather_bytes(self, feat: int, itemsize: int = 4) -> int:
        """What the full-all-gather alternative would move per hop."""
        return self.n_shards * self.nodes_per_shard * feat * itemsize

    def plan_bytes_per_device(self) -> int:
        """Device-resident plan memory per shard (operator blocks +
        send plan) — the thing the sparse modes keep at O(E/S)."""
        leaves = list(self.local) + list(self.halo) + [self.send_idx]
        return sum(l.size * l.dtype.itemsize for l in leaves
                   ) // self.n_shards


def build_halo_spec(g: Graph, n_shards: int, dtype=jnp.float32,
                    mode: str = "auto") -> HaloSpec:
    """Partition ``g``'s nodes into ``n_shards`` contiguous blocks and
    precompute the boundary-exchange plan. Reorder the graph first
    (e.g. RCM) to localize the boundary; the partition itself is plain
    contiguous blocks of the given node order."""
    n = g.num_nodes
    s = n_shards
    nl = -(-n // s)                 # ceil
    if mode == "auto":
        # dense diagonal blocks are the MXU-fastest up to a few k nodes
        # per shard; past that the O(Nl^2) plan memory dominates
        mode = "dense" if nl <= 4096 else "bsr"
    if mode == "bsr":
        nl = -(-nl // _BLOCK) * _BLOCK
    # CSR block slicing, never the full dense [N_pad, N_pad] (O(N^2)
    # host memory would cap the graph size this plan can be built for)
    csr = g.to_scipy().tocsr()

    # pass 1: per-shard row blocks + boundary sets (what i needs from j)
    need = [[None] * s for _ in range(s)]
    counts = np.zeros((s, s), np.int64)
    row_blocks = []
    for i in range(s):
        rows = csr[i * nl:min((i + 1) * nl, n)].tocsc()
        row_blocks.append(rows)
        for j in range(s):
            if j == i:
                continue
            block = rows[:, j * nl:min((j + 1) * nl, n)].tocoo()
            # explicitly-stored zeros are not real dependencies: they'd
            # inflate b_max / the send buffers / the bytes-per-hop ledger
            nz = np.unique(block.col[block.data != 0])
            need[i][j] = nz
            counts[i, j] = len(nz)
    b_max = max(1, int(counts.max()))

    # pass 2: send plan + halo entries in recv-layout columns
    send_idx = np.zeros((s, s, b_max), np.int32)
    halo_coo = [[] for _ in range(s)]    # per shard: (dst, recv_col, w)
    for i in range(s):
        rows = row_blocks[i]
        for j in range(s):
            if j == i:
                continue
            nz = need[i][j]
            send_idx[j, i, :len(nz)] = nz   # j SENDS these rows to i
            if not len(nz):
                continue
            block = rows[:, j * nl:min((j + 1) * nl, n)].tocoo()
            keep = block.data != 0
            dst, col, w = (block.row[keep], block.col[keep],
                           block.data[keep])
            recv_col = j * b_max + np.searchsorted(nz, col)
            halo_coo[i].append((dst, recv_col, w))

    local, halo = _pack_blocks(mode, row_blocks, halo_coo, s, nl, n,
                               b_max)
    local = tuple(jnp.asarray(a, dtype if a.dtype == np.float32 else None)
                  for a in local)
    halo = tuple(jnp.asarray(a, dtype if a.dtype == np.float32 else None)
                 for a in halo)
    return HaloSpec(mode, local, halo, jnp.asarray(send_idx), s, nl, n,
                    b_max, counts)


def _pack_blocks(mode, row_blocks, halo_coo, s, nl, n, b_max):
    """Stack the per-shard local/halo operator blocks for one mode."""
    import scipy.sparse as sp

    def local_block(i):
        lb = row_blocks[i][:, i * nl:min((i + 1) * nl, n)].copy()
        lb.resize((nl, nl))
        return lb

    if mode == "dense":
        a_local = np.stack([local_block(i).toarray().astype(np.float32)
                            for i in range(s)])
    elif mode == "bsr":
        per = []
        for i in range(s):
            bsr = sp.csr_matrix(local_block(i)).tobsr(
                blocksize=(_BLOCK, _BLOCK))
            bsr.sort_indices()
            brows = np.repeat(np.arange(len(bsr.indptr) - 1, dtype=np.int32),
                              np.diff(bsr.indptr))
            per.append((np.asarray(bsr.data, np.float32),
                        brows, np.asarray(bsr.indices, np.int32)))
        nb = max(1, max(len(p[2]) for p in per))
        blocks = np.zeros((s, nb, _BLOCK, _BLOCK), np.float32)
        brows = np.zeros((s, nb), np.int32)
        bcols = np.zeros((s, nb), np.int32)
        for i, (d, r, c) in enumerate(per):
            blocks[i, :len(c)], brows[i, :len(c)], bcols[i, :len(c)] = \
                d, r, c
        a_local = (blocks, brows, bcols)
    elif mode == "coo":
        per = []
        for i in range(s):
            lb = local_block(i).tocoo()
            keep = lb.data != 0
            per.append((lb.col[keep], lb.row[keep],
                        lb.data[keep].astype(np.float32)))
        ne = max(1, max(len(p[0]) for p in per))
        src = np.zeros((s, ne), np.int32)
        dst = np.zeros((s, ne), np.int32)
        w = np.zeros((s, ne), np.float32)
        for i, (c, r, d) in enumerate(per):
            src[i, :len(c)], dst[i, :len(c)], w[i, :len(c)] = c, r, d
        a_local = (src, dst, w)
    else:
        raise ValueError(f"unknown halo mode {mode!r}")

    # halo side: dense [Nl, S*B] matrix for 'dense', COO otherwise
    if mode == "dense":
        a_halo = np.zeros((s, nl, s * b_max), np.float32)
        for i, coos in enumerate(halo_coo):
            for d, c, v in coos:
                a_halo[i, d, c] = v
        return (a_local,), (a_halo,)
    per = []
    for coos in halo_coo:
        if coos:
            d = np.concatenate([e[0] for e in coos])
            c = np.concatenate([e[1] for e in coos])
            v = np.concatenate([e[2] for e in coos]).astype(np.float32)
        else:
            d = c = np.zeros(0, np.int64)
            v = np.zeros(0, np.float32)
        per.append((c, d, v))
    ne = max(1, max(len(p[0]) for p in per))
    hsrc = np.zeros((s, ne), np.int32)
    hdst = np.zeros((s, ne), np.int32)
    hw = np.zeros((s, ne), np.float32)
    for i, (c, d, v) in enumerate(per):
        hsrc[i, :len(c)], hdst[i, :len(c)], hw[i, :len(c)] = c, d, v
    local_t = a_local if isinstance(a_local, tuple) else (a_local,)
    return local_t, (hsrc, hdst, hw)


def _apply_local(mode: str, local, x):
    """``A_local @ x`` for one shard; ``x [..., Nl, F]``."""
    if mode == "dense":
        (a,) = local
        return jnp.einsum("ij,...jf->...if", a, x,
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
    x2 = jnp.moveaxis(x, -2, 0)          # [Nl, ..., F]
    if mode == "bsr":
        blocks, brows, bcols = local
        bs = blocks.shape[-1]
        n_br = x.shape[-2] // bs
        idx = bcols[:, None] * bs + jnp.arange(bs)[None, :]
        xg = x2[idx]                     # [nb, bs, ..., F]
        yb = jnp.einsum("nij,nj...->ni...", blocks, xg,
                        preferred_element_type=jnp.float32)
        y = jax.ops.segment_sum(yb, brows, num_segments=n_br)
        y = y.reshape((n_br * bs,) + x2.shape[1:])
    else:                                # coo
        src, dst, w = local
        msgs = x2[src] * w.reshape((-1,) + (1,) * (x2.ndim - 1))
        y = jax.ops.segment_sum(msgs, dst, num_segments=x.shape[-2])
    return jnp.moveaxis(y, 0, -2).astype(x.dtype)


def _apply_halo(mode: str, halo, x_halo, nl: int):
    """``A_halo @ recv`` for one shard; ``x_halo [..., S*B, F]``."""
    if mode == "dense":
        (a,) = halo
        return jnp.einsum("ij,...jf->...if", a, x_halo,
                          preferred_element_type=jnp.float32
                          ).astype(x_halo.dtype)
    hsrc, hdst, hw = halo
    x2 = jnp.moveaxis(x_halo, -2, 0)
    msgs = x2[hsrc] * hw.reshape((-1,) + (1,) * (x2.ndim - 1))
    y = jax.ops.segment_sum(msgs, hdst, num_segments=nl)
    return jnp.moveaxis(y, 0, -2).astype(x_halo.dtype)


def _halo_hop(mode, x_local, local, halo, send_idx, axis: str):
    """One hop on a device's local shard. ``x_local [..., Nl, F]``."""
    s, b = send_idx.shape
    # gather the rows each peer needs: [..., S, B, F]
    send = jnp.take(x_local, send_idx.reshape(-1), axis=-2)
    send = send.reshape(x_local.shape[:-2] + (s, b, x_local.shape[-1]))
    recv = jax.lax.all_to_all(send, axis, split_axis=send.ndim - 3,
                              concat_axis=send.ndim - 3)
    x_halo = recv.reshape(x_local.shape[:-2] + (s * b,
                                                x_local.shape[-1]))
    # local block matmul (overlaps the collective under XLA scheduling)
    out = _apply_local(mode, local, x_local)
    return out + _apply_halo(mode, halo, x_halo, x_local.shape[-2])


def halo_khop(spec: HaloSpec, x: jnp.ndarray, mesh: Mesh, k: int = 1,
              axis: str = "model", concat: bool = False) -> jnp.ndarray:
    """K-hop propagation of node-sharded ``x [..., N, F]`` using
    boundary-only exchange. Returns the k-th hop (or the
    ``[x, Ax, ..., A^k x]`` concat when ``concat=True``), node-sharded.

    Pads the node dim to ``S * Nl`` if needed (pad rows of ``A`` are
    zero, so padded outputs are zero and sliced off)."""
    n = spec.num_nodes
    n_pad = spec.n_shards * spec.nodes_per_shard
    padded_here = x.shape[-2] == n and n_pad != n
    if padded_here:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, n_pad - n), (0, 0)]
        x = jnp.pad(x, pad)
    node_spec = P(*([None] * (x.ndim - 2)), axis, None)
    mode = spec.mode

    def local_fn(local, halo, send_idx, x_local):
        local = tuple(a[0] for a in local)
        halo = tuple(a[0] for a in halo)
        send_idx = send_idx[0]
        outs = [x_local]
        for _ in range(k):
            outs.append(_halo_hop(mode, outs[-1], local, halo, send_idx,
                                  axis))
        if concat:
            return jnp.concatenate(outs, -1)
        return outs[-1]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(tuple(P(axis) for _ in spec.local),
                  tuple(P(axis) for _ in spec.halo),
                  P(axis), node_spec),
        out_specs=node_spec, check_vma=False)
    out = fn(spec.local, spec.halo, spec.send_idx, x)
    if padded_here:
        out = out[..., :n, :]
    return out


def shard_nodes(x: jnp.ndarray, mesh: Mesh, axis: str = "data",
                node_axis: int = -2) -> jnp.ndarray:
    """Place ``x`` on the mesh sharded along its node axis (pads the
    node dim to a multiple of the axis size if needed)."""
    size = mesh.shape[axis]
    nd = node_axis % x.ndim
    n = x.shape[nd]
    n_pad = -(-n // size) * size
    if n_pad != n:
        pad = [(0, 0)] * x.ndim
        pad[nd] = (0, n_pad - n)
        x = jnp.pad(x, pad)
    spec = [None] * x.ndim
    spec[nd] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))

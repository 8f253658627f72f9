"""Boundary halo exchange for node-sharded K-hop propagation.

SURVEY.md §5.8: partition the node dimension 1-D over a mesh axis; per
hop, exchange ONLY the boundary rows each shard's in-edges reference on
other shards (``ppermute``/``all_to_all`` over ICI), instead of
all-gathering the full ``[N, F]`` activation (the round-1
``sharded_spmm``). With a locality-preserving node order (RCM,
:func:`sgp_tpu.graph.sparse.rcm_order`) the exchanged bytes per hop are
``S * B_max * F`` per device with ``B_max ≪ N`` — the thing that keeps
multi-chip propagation scaling at graph sizes where it matters.

Everything static-shape: boundary index sets are precomputed on host,
padded to the max per-peer count, and shipped as per-shard constants
(stacked ``[S, ...]`` arrays sharded over the axis so each device reads
its own slice). The device-side hop is

    out_local = A_local @ x_local + A_halo @ all_to_all(x_local[send_idx])

with the local block matmul overlapping the collective.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgp_tpu.graph.sparse import Graph


@dataclasses.dataclass
class HaloSpec:
    """Host-built halo-exchange plan for a 1-D node partition.

    Arrays are stacked per-shard (leading dim ``S``) so that sharding
    them over the mesh axis hands each device exactly its own slice:

    - ``a_local [S, Nl, Nl]``: the diagonal (local->local) block of each
      shard's rows of ``A``.
    - ``a_halo [S, Nl, S*B]``: the off-diagonal entries, columns laid
      out in recv order (peer-j section ``j*B:(j+1)*B`` = the values of
      the nodes this shard needs from peer ``j``, padded with zeros).
    - ``send_idx [S, S, B]``: on device ``i``, slot ``j`` holds the
      LOCAL indices of the rows peer ``j`` needs from ``i`` (pad 0).
    """
    a_local: jnp.ndarray
    a_halo: jnp.ndarray
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


def build_halo_spec(g: Graph, n_shards: int, dtype=jnp.float32) -> HaloSpec:
    """Partition ``g``'s nodes into ``n_shards`` contiguous blocks and
    precompute the boundary-exchange plan. Reorder the graph first
    (e.g. RCM) to localize the boundary; the partition itself is plain
    contiguous blocks of the given node order."""
    n = g.num_nodes
    nl = -(-n // n_shards)          # ceil
    s = n_shards
    # CSR block slicing, never the full dense [N_pad, N_pad] (O(N^2)
    # host memory would cap the graph size this plan can be built for;
    # CSR keeps host peak at O(E + S * Nl^2) — the dense per-shard
    # blocks the device design needs anyway)
    csr = g.to_scipy().tocsr()

    a_local = np.zeros((s, nl, nl), np.float32)
    need = [[None] * s for _ in range(s)]
    counts = np.zeros((s, s), np.int64)
    row_blocks = []
    for i in range(s):
        rows = csr[i * nl:min((i + 1) * nl, n)].tocsc()
        row_blocks.append(rows)
        loc = rows[:, i * nl:min((i + 1) * nl, n)].toarray()
        a_local[i, :loc.shape[0], :loc.shape[1]] = loc
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

    a_halo = np.zeros((s, nl, s * b_max), np.float32)
    send_idx = np.zeros((s, s, b_max), np.int32)
    for i in range(s):
        rows = row_blocks[i]
        for j in range(s):
            if j == i:
                continue
            nz = need[i][j]
            if len(nz):
                sub = rows[:, j * nl + nz].toarray()
                a_halo[i, :sub.shape[0],
                       j * b_max:j * b_max + len(nz)] = sub
            # device j must SEND these rows to device i
            send_idx[j, i, :len(nz)] = nz
    return HaloSpec(jnp.asarray(a_local, dtype), jnp.asarray(a_halo, dtype),
                    jnp.asarray(send_idx), s, nl, n, b_max, counts)


def _halo_hop(x_local, a_local, a_halo, send_idx, axis: str):
    """One hop on a device's local shard. ``x_local [..., Nl, F]``."""
    s, b = send_idx.shape
    # gather the rows each peer needs: [..., S, B, F]
    send = jnp.take(x_local, send_idx.reshape(-1), axis=-2)
    send = send.reshape(x_local.shape[:-2] + (s, b, x_local.shape[-1]))
    recv = jax.lax.all_to_all(send, axis, split_axis=send.ndim - 3,
                              concat_axis=send.ndim - 3)
    halo = recv.reshape(x_local.shape[:-2] + (s * b, x_local.shape[-1]))
    # local block matmul (overlaps the collective under XLA scheduling)
    out = jnp.einsum("ij,...jf->...if", a_local, x_local,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("ij,...jf->...if", a_halo, halo,
                           preferred_element_type=jnp.float32)
    return out.astype(x_local.dtype)


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

    def local_fn(a_local, a_halo, send_idx, x_local):
        a_local, a_halo, send_idx = a_local[0], a_halo[0], send_idx[0]
        outs = [x_local]
        for _ in range(k):
            outs.append(_halo_hop(outs[-1], a_local, a_halo, send_idx,
                                  axis))
        if concat:
            return jnp.concatenate(outs, -1)
        return outs[-1]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), node_spec),
        out_specs=node_spec, check_vma=False)
    out = fn(spec.a_local, spec.a_halo, spec.send_idx, x)
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

"""Multi-device scaling harness.

Measures propagation (SpMM) and fused-IID-training throughput at 1
device vs N devices on whatever mesh is available (real chips on a pod
slice; the 8-device virtual CPU mesh in CI) and reports scaling
efficiency — the edges/s 1-chip/1-host/N-hosts measurement BASELINE.json
asks for (the reference has no distributed mode to compare against).
"""
from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sgp_tpu.graph.sparse import Graph
from sgp_tpu.ops.spmm import build_operator
from sgp_tpu.parallel import make_mesh, shard_operator, sharded_spmm


def _time(fn, *args, iters=20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# Interconnect constants for the predictive model (public TPU v5e
# figures): ICI ~ 1.6 Tbit/s aggregate per chip (~200 GB/s), DCN
# (between hosts) ~ 25 GB/s per host with ~50 us collective latency.
ICI_BYTES_PER_S = 200e9
DCN_BYTES_PER_S = 25e9
ICI_LATENCY_S = 2e-6
DCN_LATENCY_S = 50e-6
CHIPS_PER_HOST = 8


def host_boundary_ledger(g: Graph, n_shards: int,
                         chips_per_host: int = CHIPS_PER_HOST,
                         order: str = "natural") -> Dict[str, int]:
    """Boundary sizes of the HIERARCHICAL halo exchange (see
    ``parallel/halo.py::halo_khop`` two-level path): per contiguous
    1-D partition of ``n_shards`` shards grouped ``chips_per_host`` per
    host, returns

    - ``b_intra``: max rows any shard needs from a SAME-host peer
      (rides ICI in the intra-host ``all_to_all``);
    - ``b_cross``: max rows any (source shard, remote HOST) pair ships
      over DCN — the union over the host's shards, i.e. each boundary
      row crosses DCN ONCE per needing host instead of once per
      needing chip (the flat ``all_to_all`` additionally pads every
      one of the S-1 peer slots to the global ``b_max``).
    """
    from sgp_tpu.graph.sparse import permute_nodes, rcm_order
    if isinstance(order, np.ndarray):
        g = permute_nodes(g, order)
    elif order == "rcm":
        g = permute_nodes(g, rcm_order(g))
    n, s = g.num_nodes, n_shards
    nl = -(-n // s)
    csr = g.to_scipy().tocsr()
    hosts = -(-s // chips_per_host)
    b_intra = 0
    # (source shard j, dest host H) -> union of boundary rows of j that
    # any shard of H needs — what j ships to H ONCE over DCN
    need_by_pair: Dict[tuple, set] = {}
    for i in range(s):
        rows = csr[i * nl:min((i + 1) * nl, n)].tocsc()
        hi = i // chips_per_host
        for j in range(s):
            if j == i:
                continue
            block = rows[:, j * nl:min((j + 1) * nl, n)].tocoo()
            nz = np.unique(block.col[block.data != 0])
            if j // chips_per_host == hi:
                b_intra = max(b_intra, len(nz))
            else:
                need_by_pair.setdefault((j, hi), set()).update(
                    nz.tolist())
    b_cross = max((len(v) for v in need_by_pair.values()), default=0)
    return {"b_intra": int(b_intra), "b_cross": int(b_cross),
            "hosts": hosts}


def project_scaling(g: Graph, feat: int,
                    single_chip_edges_per_s: float,
                    n_chips_list=(1, 8, 32), k: int = 1,
                    itemsize: int = None, order: str = "rcm",
                    payload_dtype: str = "bfloat16",
                    hierarchical: bool = True,
                    depth: int = 1) -> Dict[str, dict]:
    """Predictive comm/compute model for node-sharded K-hop propagation
    (VERDICT round-2 item 9): from the halo plan's bytes-per-hop ledger
    plus a MEASURED single-chip SpMM rate, project edges/s and scaling
    efficiency at each chip count — so the >=80% host->pod efficiency
    north star is a falsifiable prediction, not an aspiration.

    Per device and hop: compute time = (E/S) / r_single; comm time =
    send-buffer bytes over the links on the path plus latency. Within
    one host everything rides ICI. Across hosts (``hierarchical``,
    matching the shipped two-level exchange): boundary rows cross DCN
    once per (source shard, needing HOST) — deduplicated and
    ``b_cross``-padded — then redistribute over ICI; the flat
    single-level ``all_to_all`` model (``hierarchical=False``, the
    round-4 ledger) charges all ``S * b_max`` padded rows at DCN
    bandwidth. ``order='rcm'`` + ``payload_dtype='bfloat16'`` are the
    shipped plan defaults; the returned rows carry the naive f32/flat
    ledger next to the effective one so the win is auditable. With
    overlap (the plan issues the exchange alongside the local block
    matmul) the hop costs max(compute, comm); without, their sum.
    Efficiency = ideal time / (S * per-hop time).

    ``depth`` (deep halo, ``build_halo_spec(..., depth=d)``): the
    collective — and its fixed DCN latency, which dominates the
    single-pass 32-chip row — fires once per ``d`` hops; the ``d-1``
    in-between hops instead advance the (depth-d, so larger) halo
    buffer in place (``ext_edges_max`` extra edges of compute per
    hop). Exchange bytes grow with the deeper boundary; the reported
    ``comm_bytes_per_hop`` is amortized (bytes per exchange / d)."""
    from sgp_tpu.parallel.halo import build_halo_spec

    edges = g.num_edges * k
    t_single = edges / single_chip_edges_per_s
    out = {}
    for s in n_chips_list:
        if s == 1:
            out["1"] = {"edges_per_s": single_chip_edges_per_s,
                        "efficiency": 1.0, "comm_bytes_per_hop": 0}
            continue
        crosses_hosts = s > CHIPS_PER_HOST
        # the two-level plan needs whole hosts; odd chip counts fall
        # back to the flat all_to_all ledger
        use_hier = (crosses_hosts and hierarchical
                    and s % CHIPS_PER_HOST == 0)
        spec = build_halo_spec(
            g, s, order=order, payload_dtype=payload_dtype,
            depth=depth, mode="coo", host_only=True,
            chips_per_host=(CHIPS_PER_HOST if use_hier else None))
        per_row = (feat * spec.payload_itemsize()
                   + (4 if payload_dtype == "int8" else 0)) \
            if itemsize is None else feat * itemsize
        flat_bytes = s * spec.b_max * per_row
        # r4 audit baseline: f32 + flat + per-hop exchange — uses the
        # DEPTH-1 boundary so it stays the same yardstick at any depth
        naive_bytes = s * spec.b_max_hop1 * feat * 4
        t_comp = (g.num_edges / s) / single_chip_edges_per_s
        # deep-halo in-buffer hops advance the halo rows too
        t_ext = spec.ext_edges_max() / single_chip_edges_per_s
        if not crosses_hosts:
            comm_bytes = flat_bytes
            t_comm = comm_bytes / ICI_BYTES_PER_S + ICI_LATENCY_S
        elif use_hier:
            # read b_intra/b_cross from the spec's own two-level plan
            # (depth-consistent boundary sets)
            _, _, _, c, hosts, b_intra, b_cross = spec.hier
            dcn_bytes = (hosts - 1) * b_cross * per_row
            # intra all_to_all + cross-buffer redistribution (ICI)
            ici_bytes = (c - 1) * b_intra * per_row \
                + (c - 1) * (hosts - 1) * b_cross * per_row
            comm_bytes = dcn_bytes + ici_bytes
            t_comm = (dcn_bytes / DCN_BYTES_PER_S + DCN_LATENCY_S
                      + ici_bytes / ICI_BYTES_PER_S + ICI_LATENCY_S)
        else:
            comm_bytes = flat_bytes
            t_comm = comm_bytes / DCN_BYTES_PER_S + DCN_LATENCY_S
        d = max(1, depth)
        # one exchange (overlapping the first hop's local matmul) then
        # d-1 in-buffer hops; per-hop cost is the group amortization
        t_hop_overlap = (max(t_comp, t_comm)
                         + (d - 1) * (t_comp + t_ext)) / d
        t_hop_serial = (t_comp + t_comm
                        + (d - 1) * (t_comp + t_ext)) / d
        row = {
            "edges_per_s": g.num_edges * k / (k * t_hop_overlap),
            "edges_per_s_no_overlap": g.num_edges * k
                / (k * t_hop_serial),
            "efficiency": (t_single / k) / (s * t_hop_overlap),
            "efficiency_no_overlap": (t_single / k)
                / (s * t_hop_serial),
            "comm_bytes_per_hop": int(comm_bytes / d),
            "comm_bytes_per_hop_naive_f32_flat": int(naive_bytes),
            "comm_bound": bool(t_comm > d * t_comp + (d - 1) * t_ext),
            "boundary_b_max": spec.b_max,
            "depth": d,
        }
        if crosses_hosts and use_hier:
            row["dcn_bytes_per_hop"] = int(dcn_bytes / d)
            row["b_cross_host"] = int(b_cross)
        out[str(s)] = row
    return out


def propagation_scaling(g: Graph, feat: int = 128, k: int = 2,
                        n_devices: int = None) -> Dict[str, float]:
    """edges/s of K-hop propagation single-device vs node-sharded over
    the mesh (boundary halo exchange), plus the communication ledger:
    bytes exchanged per hop per device (``S * B_max * F``) vs what a
    full all-gather would move (``N * F``) — VERDICT round-1 Next-2's
    done-criterion. Efficiency on a virtual CPU mesh measures sharding
    overhead (the devices share cores), on real chips speedup."""
    from sgp_tpu.parallel.halo import build_halo_spec, halo_khop, shard_nodes

    n_devices = n_devices or len(jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((g.num_nodes, feat)).astype(np.float32))
    op = build_operator(g, "dense", precision="default")

    @jax.jit
    def khop_single(x):
        cur = x
        for _ in range(k):
            cur = op @ cur
        return cur

    t_single = _time(khop_single, x)

    mesh = make_mesh(1, n_devices)
    spec = build_halo_spec(g, n_devices)
    xs = shard_nodes(x, mesh, "model")

    import dataclasses
    import functools

    # jit with the spec's device arrays threaded as ARGUMENTS (not
    # closure constants) so the trace is cached across the timed
    # iterations and the arrays never bake into the jaxpr.
    @functools.partial(jax.jit, donate_argnums=())
    def khop_halo_fn(local, halo, send_idx, xv):
        sp = dataclasses.replace(spec, local=local, halo=halo,
                                 send_idx=send_idx)
        return halo_khop(sp, xv, mesh, k=k, axis="model")

    with mesh:
        t_halo = _time(khop_halo_fn, spec.local, spec.halo,
                       spec.send_idx, xs)

    # legacy full-all-gather sharding, for the comparison ledger
    op_s = shard_operator(op, mesh)

    @jax.jit
    def khop_allgather(x):
        cur = x
        for _ in range(k):
            cur = sharded_spmm(op_s, cur, mesh)
        return cur

    with mesh:
        t_allgather = _time(khop_allgather, x)

    edges = g.num_edges * k
    return {
        "n_devices": n_devices,
        "edges_per_s_single": edges / t_single,
        "edges_per_s_halo": edges / t_halo,
        "edges_per_s_allgather": edges / t_allgather,
        "halo_over_single": t_single / t_halo,
        "halo_bytes_per_hop_per_device": spec.bytes_per_hop(feat),
        "allgather_bytes_per_hop_per_device":
            spec.dense_gather_bytes(feat),
        "halo_comm_fraction": spec.bytes_per_hop(feat)
            / max(spec.dense_gather_bytes(feat), 1),
        "boundary_b_max": spec.b_max,
    }

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


def project_scaling(g: Graph, feat: int,
                    single_chip_edges_per_s: float,
                    n_chips_list=(1, 8, 32), k: int = 1,
                    itemsize: int = 4) -> Dict[str, dict]:
    """Predictive comm/compute model for node-sharded K-hop propagation
    (VERDICT round-2 item 9): from the halo plan's bytes-per-hop ledger
    plus a MEASURED single-chip SpMM rate, project edges/s and scaling
    efficiency at each chip count — so the >=80% host->pod efficiency
    north star is a falsifiable prediction, not an aspiration.

    Per device and hop: compute time = (E/S) / r_single; comm time =
    send-buffer bytes over the slowest link on the path (ICI within a
    host, DCN once S spans hosts) plus latency. With overlap (the plan
    issues the all_to_all alongside the local block matmul) the hop
    costs max(compute, comm); without overlap, their sum. Efficiency =
    ideal time / (S * per-hop time), i.e. 1.0 = perfect linear scaling.
    """
    from sgp_tpu.parallel.halo import build_halo_spec

    edges = g.num_edges * k
    t_single = edges / single_chip_edges_per_s
    out = {}
    for s in n_chips_list:
        if s == 1:
            out["1"] = {"edges_per_s": single_chip_edges_per_s,
                        "efficiency": 1.0, "comm_bytes_per_hop": 0}
            continue
        spec = build_halo_spec(g, s)
        comm_bytes = spec.bytes_per_hop(feat, itemsize)
        crosses_hosts = s > CHIPS_PER_HOST
        bw = DCN_BYTES_PER_S if crosses_hosts else ICI_BYTES_PER_S
        lat = DCN_LATENCY_S if crosses_hosts else ICI_LATENCY_S
        t_comp = (g.num_edges / s) / single_chip_edges_per_s
        t_comm = comm_bytes / bw + lat
        t_hop_overlap = max(t_comp, t_comm)
        t_hop_serial = t_comp + t_comm
        out[str(s)] = {
            "edges_per_s": g.num_edges * k / (k * t_hop_overlap),
            "edges_per_s_no_overlap": g.num_edges * k
                / (k * t_hop_serial),
            "efficiency": (t_single / k) / (s * t_hop_overlap),
            "efficiency_no_overlap": (t_single / k)
                / (s * t_hop_serial),
            "comm_bytes_per_hop": int(comm_bytes),
            "comm_bound": bool(t_comm > t_comp),
            "boundary_b_max": spec.b_max,
        }
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

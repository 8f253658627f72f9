"""Benchmark: SGP pipeline at PV-US scale on one TPU chip.

Prints ONE JSON line. Headline metric: fused IID decoder-training
throughput (batch/s at batch 4096) at PV-US scale (5,016 nodes, 100-nn
graph, sgp_pv.yaml decoder shape) vs the reference's 116.58 batch/s on
an RTX A5000 (BASELINE.md Table 2). Also reports encoder-precompute
wall-clock and per-chip SpMM edge throughput.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_BATCH_S = 116.58  # PV-US 100-nn SGP row, BASELINE.md


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from sgp_tpu.data import ScalerParams
    from sgp_tpu.encode import Reservoir, sgp_spatial_embedding
    from sgp_tpu.graph import Graph, coalesce, normalize_adj
    from sgp_tpu.graph.similarities import gaussian_kernel, top_k
    from sgp_tpu.models import SGPModel
    from sgp_tpu.ops import build_operator, spmm
    from sgp_tpu.train.iid import make_fused_iid_multi_step

    rng = np.random.default_rng(0)
    n_nodes, t_steps = 5016, 1024
    horizon, horizon_lag = 22, 7

    # --- 100-nn graph over random plant positions (PV-US shape)
    pos = rng.random((n_nodes, 2)).astype(np.float32)
    # build knn graph without materializing all-pairs distances twice
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    sim = np.exp(-d2 / 0.01)
    np.fill_diagonal(sim, 0)
    adj = top_k(sim, 100, include_self=True, keep_values=True)
    g = normalize_adj(coalesce(Graph.from_dense(adj)), "row")
    n_edges = g.num_edges

    # --- encoder precompute (reservoir 16x8 + k=2 + global, sgp_pv.yaml)
    x_series = jnp.asarray(
        rng.standard_normal((t_steps, n_nodes, 3)).astype(np.float32))
    res = Reservoir(input_size=3, hidden_size=16, num_layers=8,
                    leaking_rate=1.0, spectral_radius=0.99, density=0.7,
                    alpha_decay=True)
    op = build_operator(g, "dense", precision="default")

    chunk = 64

    @jax.jit
    def reservoir_run(x):
        return res.__call__(x)                  # [T, N, 128] f32

    @jax.jit
    def spatial_chunk(hc, op):  # op as arg: keep the 100MB operator out
        # of the jaxpr constants (closure capture stalls XLA folding)
        # [Tc, N, 128] -> [Tc, N, 512] bf16 (k=2 hops + global mean)
        parts = [hc]
        cur = hc
        for _ in range(2):
            cur = spmm(op, cur)
            parts.append(cur)
        parts.append(jnp.broadcast_to(
            hc.mean(-2, keepdims=True), hc.shape))
        return jnp.concatenate(parts, -1).astype(jnp.bfloat16)

    def encode(x):
        h = reservoir_run(x)
        outs = [spatial_chunk(h[s:s + chunk], op)
                for s in range(0, t_steps, chunk)]
        del h
        out = jnp.concatenate(outs, axis=0)
        del outs
        return out

    t0 = time.time()
    encoded = jax.block_until_ready(encode(x_series))  # [T,N,512] bf16
    encode_compile_s = time.time() - t0
    encoded = None  # free before re-encode (peak HBM headroom)
    t0 = time.time()
    encoded = jax.block_until_ready(encode(x_series))
    encode_s = time.time() - t0  # steady-state (compile excluded)

    # --- SpMM throughput (128-channel pass over the 100-nn graph)
    xf = jnp.asarray(
        rng.standard_normal((n_nodes, 128)).astype(np.float32))
    spmm_j = jax.jit(lambda x: spmm(op, x))
    jax.block_until_ready(spmm_j(xf))
    t0 = time.time()
    iters = 50
    for _ in range(iters):
        out = spmm_j(xf)
    jax.block_until_ready(out)
    spmm_edges_s = n_edges * iters / (time.time() - t0)

    # --- fused IID decoder training (sgp_pv.yaml decoder, batch 4096)
    h_steps = len(range(0, horizon, horizon_lag))       # 4 eval steps
    target = jnp.asarray(
        rng.standard_normal((t_steps, n_nodes, 1)).astype(np.float32))
    mask = jnp.ones((t_steps, n_nodes, 1), bool)
    valid = jnp.arange(t_steps - (1 + horizon))
    h_off = 1 + jnp.arange(0, horizon, horizon_lag)
    model = SGPModel(input_size=int(encoded.shape[-1]), order=32,
                     n_nodes=n_nodes, hidden_size=960, mlp_size=256,
                     output_size=1, n_layers=2, horizon=h_steps,
                     positional_encoding=True, emb_size=32, resnet=True)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key},
                        jnp.zeros((8, int(encoded.shape[-1]))),
                        node_index=jnp.zeros(8, jnp.int32), iid=True)
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.adam(1e-3))
    opt_state = optimizer.init(params)
    scaler = ScalerParams(jnp.zeros(1), jnp.ones(1))
    steps_per_call = 200
    step = make_fused_iid_multi_step(model, optimizer, encoded, target,
                                     mask, valid, h_off, scaler,
                                     batch_size=4096,
                                     steps_per_call=steps_per_call)
    params, opt_state, loss = step(params, opt_state, key)  # compile
    jax.block_until_ready(loss)
    for _ in range(5):  # warmup: first post-compile calls run ~2x slow
        key, k2 = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k2)
    jax.block_until_ready(loss)
    t0 = time.time()
    calls = 5
    for i in range(calls):
        key, k2 = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k2)
    jax.block_until_ready(loss)
    batch_s = calls * steps_per_call / (time.time() - t0)

    print(json.dumps({
        "metric": "sgp_iid_decoder_train_throughput_pvus100nn_b4096",
        "value": round(batch_s, 2),
        "unit": "batch/s",
        "vs_baseline": round(batch_s / BASELINE_BATCH_S, 2),
        "extras": {
            "encode_wall_s_T1024_N5016_D512": round(encode_s, 2),
            "encode_first_call_incl_compile_s": round(encode_compile_s, 2),
            "spmm_edges_per_s": int(spmm_edges_s),
            "n_edges_100nn": int(n_edges),
            "final_loss": float(loss),
        },
    }))


if __name__ == "__main__":
    main()

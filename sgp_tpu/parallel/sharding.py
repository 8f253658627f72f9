"""Sharding annotations for multi-chip SGP.

Strategy (SURVEY.md §2.7 / §5.8, new capability over the reference):

- **Node-sharded propagation** ("spatial TP"): the dense operator
  ``A [N, N]`` is row-sharded over the ``model`` axis; features stay
  replicated (or node-sharded), so each chip computes its row block of
  ``A @ x`` locally and XLA all-gathers the hop output before the next
  hop — the halo exchange of a 1-D node partition, riding ICI.
- **Data-parallel decoder training**: the IID sample batch is sharded
  over ``data``; parameters replicated; XLA psums gradients.
- **Tensor-parallel decoder** (optional): wide Dense kernels sharded on
  the output feature axis over ``model``.
- **Sharded ridge**: per-shard Gram/moment + psum, replicated Cholesky.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgp_tpu.data.scalers import ScalerParams
from sgp_tpu.ops.spmm import DenseOperator


def shard_operator(op: DenseOperator, mesh: Mesh,
                   axis: str = "model") -> DenseOperator:
    """Row-shard the dense propagation operator over ``axis`` — each
    chip owns the outgoing rows (destination nodes) of its node shard."""
    sharding = NamedSharding(mesh, P(axis, None))
    return DenseOperator(jax.device_put(op.mat, sharding), op.precision)


def sharded_spmm(op: DenseOperator, x: jnp.ndarray, mesh: Mesh,
                 axis: str = "model") -> jnp.ndarray:
    """One propagation hop with an explicit node-sharded output
    constraint; consecutive hops make XLA insert the all-gather
    (halo exchange) between them."""
    out = op @ x
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(*([None] * (x.ndim - 2)), axis, None)))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Put every batch tensor on the mesh sharded along its leading
    (sample) dimension; scaler params replicated."""
    def put(v):
        if isinstance(v, ScalerParams):
            return jax.tree.map(
                lambda p: jax.device_put(
                    p, NamedSharding(mesh, P(*([None] * p.ndim)))), v)
        arr = jnp.asarray(v)
        spec = P(axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))
    return {k: put(v) for k, v in batch.items()}


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model",
                    min_size: int = 1024) -> Any:
    """Tensor-parallel parameter placement: shard the output-feature axis
    of large 2-D kernels over ``axis`` (must divide the dim); everything
    else replicated. XLA inserts the matching collectives."""
    axis_size = mesh.shape[axis]

    def place(p):
        if (p.ndim == 2 and p.size >= min_size
                and p.shape[-1] % axis_size == 0):
            spec = P(None, axis)
        else:
            spec = P(*([None] * p.ndim))
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda p: jax.device_put(
            jnp.asarray(p), NamedSharding(mesh, P(*([None] * jnp.ndim(p))))),
        tree)


def make_sharded_iid_step(model, optimizer, encoded, target, mask,
                          valid_starts, horizon_offsets, scaler,
                          mesh: Mesh, u=None, batch_size: int = 4096,
                          loss: str = "mae",
                          scale_target: bool = False):
    """Data-parallel fused IID training over the ``data`` mesh axis.

    Each device draws its own ``batch_size / n_data`` slice of the
    sample batch from the (replicated) HBM-resident arrays — the host
    still only ships an RNG key — and gradients are psum-reduced by
    shard_map. Params/opt state replicated. This is the pod-scale DP
    form of ``sgp_tpu.train.iid.make_fused_iid_step``; per-device
    sampling is decorrelated by folding in the device index.
    """
    from jax import shard_map

    from sgp_tpu.train.iid import make_fused_iid_step
    from sgp_tpu.train.metrics import _METRIC_FNS, _masked_reduce

    n_data = mesh.shape["data"]
    assert batch_size % n_data == 0
    local_bs = batch_size // n_data
    loss_pt = _METRIC_FNS[loss]
    n_nodes = encoded.shape[1]
    has_u = u is not None
    data = (encoded, target, mask, valid_starts, horizon_offsets) \
        + ((u,) if has_u else ())
    repl = P()

    def local_loss(params, rng, data):
        enc, tgt, msk, valid, h_off = data[:5]
        # decorrelate per-device streams
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rng_t, rng_n, rng_d = jax.random.split(rng, 3)
        t = jax.random.choice(rng_t, valid, (local_bs,))
        n = jax.random.randint(rng_n, (local_bs,), 0, n_nodes)
        x = enc[t, n]
        y = tgt[t[:, None] + h_off[None, :], n[:, None]]
        m = msk[t[:, None] + h_off[None, :], n[:, None]]
        kwargs = {}
        if has_u:
            u_arr = data[5]
            kwargs["u"] = (u_arr[t, n] if u_arr.ndim == 3
                           else u_arr[t])
        sc = scaler.index_nodes_iid(n)
        y_hat = model.apply(params, x, node_index=n, training=True,
                            iid=True, rngs={"dropout": rng_d}, **kwargs)
        if scale_target:
            y_ref = sc.transform(y)
        else:
            y_hat = sc.inverse_transform(y_hat)
            y_ref = y
        v, cnt = _masked_reduce(loss_pt, y_hat, y_ref, m)
        v = jax.lax.psum(v, "data")
        cnt = jax.lax.psum(cnt, "data")
        return v / jnp.maximum(cnt, 1.0)

    import optax

    def local_step(params, opt_state, rng, data):
        loss_val, grads = jax.value_and_grad(local_loss)(
            params, rng, data)
        # backward of psum is identity: per-device grads cover only the
        # local samples — psum them for the full-batch gradient (keeps
        # replicated params bit-identical across devices)
        grads = jax.lax.psum(grads, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(repl, repl, repl, repl),
        out_specs=(repl, repl, repl),
        check_vma=False)
    jitted = jax.jit(sharded)

    def step(params, opt_state, rng):
        return jitted(params, opt_state, rng, data)

    return step


def sharded_ridge(x_shards, y_shards, alpha: float, mesh: Mesh):
    """Distributed normal-equations ridge: each data shard computes its
    Gram/moment contribution, psum over ``data``, Cholesky replicated
    (SURVEY.md §2.6 sklearn-Ridge row). Implemented with shard_map."""
    from jax import shard_map
    from sgp_tpu.train.ridge import solve_ridge_normal

    d = x_shards.shape[-1]
    c = y_shards.shape[-1]

    def local(x, y):
        g = jnp.einsum("nd,ne->de", x, x, precision="highest")
        m = jnp.einsum("nd,nc->dc", x, y, precision="highest")
        g = jax.lax.psum(g, "data")
        m = jax.lax.psum(m, "data")
        return solve_ridge_normal(g, m, alpha)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("data", None), P("data", None)),
                   out_specs=P(None, None))
    return fn(x_shards, y_shards)

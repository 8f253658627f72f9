"""Fused Pallas all-pairs GatedGN aggregation vs the jnp oracle.

Runs the kernel in interpreter mode on the CPU mesh (tests/conftest.py
forces ``jax_platforms=cpu``); the real-chip path is exercised by
``bench.py --section baseline3:gatedgn_full``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgp_tpu.ops.gn_allpairs import (gn_allpairs_aggregate,
                                     gn_allpairs_reference)


def _setup(seed, n=20, b=2, h2=8, h=16, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    p_i = jnp.asarray(rng.standard_normal((b, n, h2)), dtype)
    p_j = jnp.asarray(rng.standard_normal((b, n, h2)), dtype)
    mask = jnp.asarray(rng.random((n, n)) < 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h2, h)) * 0.4, dtype)
    b2 = jnp.asarray(rng.standard_normal(h) * 0.1, dtype)
    wg = jnp.asarray(rng.standard_normal((h, 1)) * 0.4, dtype)
    bg = jnp.asarray(rng.standard_normal(1) * 0.1, dtype)
    return p_i, p_j, mask, w2, b2, wg, bg


@pytest.mark.parametrize("activation", ["silu", "tanh", "relu", "elu"])
def test_forward_matches_reference(activation):
    args = _setup(0)
    got = gn_allpairs_aggregate(*args, activation, True)
    want = gn_allpairs_reference(*args, activation=activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_padding_and_masked_rows():
    # n NOT a block multiple and one node with no incoming edges
    args = list(_setup(1, n=13))
    mask = np.array(args[2])
    mask[5, :] = 0.0
    args[2] = jnp.asarray(mask)
    got = gn_allpairs_aggregate(*args, "silu", True)
    want = gn_allpairs_reference(*args)
    assert got.shape == want.shape == (2, 13, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[:, 5], 0.0, atol=1e-6)


@pytest.mark.parametrize("activation", ["silu", "tanh"])
def test_gradients_match_reference(activation):
    p_i, p_j, mask, w2, b2, wg, bg = _setup(2, n=12, b=1)

    def loss_kernel(p_i, p_j, w2, b2, wg, bg):
        out = gn_allpairs_aggregate(p_i, p_j, mask, w2, b2, wg, bg,
                                    activation, True)
        return jnp.sum(out * jnp.cos(out))   # non-trivial cotangent

    def loss_ref(p_i, p_j, w2, b2, wg, bg):
        out = gn_allpairs_reference(p_i, p_j, mask, w2, b2, wg, bg,
                                    activation=activation)
        return jnp.sum(out * jnp.cos(out))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        p_i, p_j, w2, b2, wg, bg)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        p_i, p_j, w2, b2, wg, bg)
    for a, b, name in zip(gk, gr, ["p_i", "p_j", "w2", "b2", "wg",
                                   "bg"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
            err_msg=f"grad mismatch: {name}")


def test_gradients_under_jit_and_batch():
    p_i, p_j, mask, w2, b2, wg, bg = _setup(3, n=9, b=3)

    @jax.jit
    def loss(p_i, w2):
        out = gn_allpairs_aggregate(p_i, p_j, mask, w2, b2, wg, bg,
                                    "silu", True)
        return jnp.mean(out ** 2)

    gk = jax.grad(loss, argnums=(0, 1))(p_i, w2)

    def loss_ref(p_i, w2):
        out = gn_allpairs_reference(p_i, p_j, mask, w2, b2, wg, bg)
        return jnp.mean(out ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(p_i, w2)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=5e-5, atol=5e-5)


def test_bf16_inputs_close_to_f32_oracle():
    args32 = _setup(4, n=16)
    args16 = [a.astype(jnp.bfloat16) for a in args32[:2]] + \
        [args32[2]] + [a for a in args32[3:]]
    got = gn_allpairs_aggregate(*args16, "silu", True)
    want = gn_allpairs_reference(*args32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_layer_pallas_path_matches_edge_list():
    """GatedGraphNetwork(adj=) through the FORCED Pallas kernel equals
    the explicit edge-list forward/backward with identical params."""
    from sgp_tpu.graph.sparse import Graph, coalesce
    from sgp_tpu.models import graph_layers
    from sgp_tpu.models.graph_layers import GatedGraphNetwork

    rng = np.random.default_rng(7)
    n = 12
    g = coalesce(Graph(rng.integers(0, n, 60).astype(np.int32),
                       rng.integers(0, n, 60).astype(np.int32),
                       rng.random(60).astype(np.float32), n))
    x = jnp.asarray(rng.standard_normal((2, n, 8)).astype(np.float32))
    layer = GatedGraphNetwork(output_size=8, sorted_edges=True)
    params = layer.init(jax.random.PRNGKey(0), x,
                        jnp.asarray(g.src), jnp.asarray(g.dst))
    adj = jnp.asarray(g.to_dense())          # A[dst, src]

    out_coo = layer.apply(params, x, jnp.asarray(g.src),
                          jnp.asarray(g.dst))
    graph_layers.ALLPAIRS_PALLAS = True      # force kernel (interpret)
    try:
        out_pl = layer.apply(params, x, adj=adj)

        def loss_pl(p):
            return (layer.apply(p, x, adj=adj) ** 2).sum()

        g_pl = jax.grad(loss_pl)(params)
    finally:
        graph_layers.ALLPAIRS_PALLAS = None
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_coo),
                               rtol=2e-5, atol=2e-5)

    def loss_coo(p):
        return (layer.apply(p, x, jnp.asarray(g.src),
                            jnp.asarray(g.dst)) ** 2).sum()

    g_coo = jax.grad(loss_coo)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_coo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_layer_banded_allpairs_matches_full_sweep():
    """adj_band (RCM band windows) == the full N^2 sweep == the edge
    list, values AND grads — the windows cover every edge by
    construction."""
    from sgp_tpu.graph.sparse import Graph, band_windows, coalesce
    from sgp_tpu.models.graph_layers import GatedGraphNetwork

    rng = np.random.default_rng(11)
    n = 64
    # banded graph: edges within +-4 of the diagonal (an RCM-like
    # order; rcm_order itself is covered by test_halo)
    src = np.repeat(np.arange(n), 3)
    dst = np.clip(src + rng.integers(-4, 5, len(src)), 0, n - 1)
    g = coalesce(Graph(src.astype(np.int64), dst.astype(np.int64),
                       np.ones(len(src), np.float32), n))
    adj = jnp.asarray(g.to_dense())
    band = band_windows(np.asarray(adj), block=8, width_mult=8)
    assert band[1] < n                      # genuinely band-limited
    x = jnp.asarray(rng.standard_normal((2, n, 8)).astype(np.float32))
    layer = GatedGraphNetwork(output_size=8)
    params = layer.init(jax.random.PRNGKey(0), x, adj=adj)

    out_full = layer.apply(params, x, adj=adj)
    out_band = layer.apply(params, x, adj=adj, adj_band=band)
    np.testing.assert_allclose(np.asarray(out_band),
                               np.asarray(out_full), rtol=1e-5,
                               atol=1e-5)
    out_coo = layer.apply(params, x, jnp.asarray(g.src),
                          jnp.asarray(g.dst))
    np.testing.assert_allclose(np.asarray(out_band),
                               np.asarray(out_coo), rtol=2e-5,
                               atol=2e-5)

    def loss(p, **kw):
        return (layer.apply(p, x, **kw) ** 2).sum()

    g_band = jax.grad(loss)(params, adj=adj, adj_band=band)
    g_full = jax.grad(loss)(params, adj=adj)
    for a, b in zip(jax.tree_util.tree_leaves(g_band),
                    jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # variable-width windows (uniform=False): per-block widths hug
    # each block's band — same values and grads
    band_v = band_windows(np.asarray(adj), block=8, width_mult=8,
                          uniform=False)
    assert isinstance(band_v[1], tuple) and max(band_v[1]) <= band[1]
    out_var = layer.apply(params, x, adj=adj, adj_band=band_v)
    np.testing.assert_allclose(np.asarray(out_var),
                               np.asarray(out_full), rtol=1e-5,
                               atol=1e-5)
    g_var = jax.grad(loss)(params, adj=adj, adj_band=band_v)
    for a, b in zip(jax.tree_util.tree_leaves(g_var),
                    jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

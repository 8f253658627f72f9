"""Fused Pallas ELL GatedGN aggregation vs the jnp oracle and the
edge-list layer path.

Runs the kernel in interpreter mode on the CPU mesh (tests/conftest.py
forces ``jax_platforms=cpu``); the real-chip path is exercised by
``bench.py --section baseline:gatedgn_bf16``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgp_tpu.ops.gn_ell import gn_ell_aggregate, gn_ell_reference


def _setup(seed, n=20, b=2, d=5, h2=8, h=16, dtype=jnp.float32,
           mask_p=0.85):
    rng = np.random.default_rng(seed)
    p_i = jnp.asarray(rng.standard_normal((b, n, h2)), dtype)
    pjn = jnp.asarray(rng.standard_normal((b, n, d, h2)), dtype)
    nmask = jnp.asarray(rng.random((n, d)) < mask_p, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h2, h)) * 0.4, dtype)
    b2 = jnp.asarray(rng.standard_normal(h) * 0.1, dtype)
    wg = jnp.asarray(rng.standard_normal((h, 1)) * 0.4, dtype)
    bg = jnp.asarray(rng.standard_normal(1) * 0.1, dtype)
    return p_i, pjn, nmask, w2, b2, wg, bg


@pytest.mark.parametrize("activation", ["silu", "tanh", "relu", "elu"])
def test_forward_matches_reference(activation):
    args = _setup(0)
    got = gn_ell_aggregate(*args, activation, True)
    want = gn_ell_reference(*args, activation=activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_padding():
    # n NOT a block multiple, d NOT a tile multiple, one node with no
    # valid neighbors
    args = list(_setup(1, n=13, d=7))
    nmask = np.array(args[2])
    nmask[5, :] = 0.0
    args[2] = jnp.asarray(nmask)
    got = gn_ell_aggregate(*args, "silu", True)
    want = gn_ell_reference(*args)
    assert got.shape == want.shape == (2, 13, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[:, 5], 0.0, atol=1e-6)


@pytest.mark.parametrize("activation", ["silu", "tanh"])
def test_gradients_match_reference(activation):
    p_i, pjn, nmask, w2, b2, wg, bg = _setup(2, n=12, b=1, d=6)

    def loss_kernel(p_i, pjn, w2, b2, wg, bg):
        out = gn_ell_aggregate(p_i, pjn, nmask, w2, b2, wg, bg,
                               activation, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(p_i, pjn, w2, b2, wg, bg):
        out = gn_ell_reference(p_i, pjn, nmask, w2, b2, wg, bg,
                               activation=activation)
        return jnp.sum(out * jnp.cos(out))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        p_i, pjn, w2, b2, wg, bg)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        p_i, pjn, w2, b2, wg, bg)
    for a, b, name in zip(gk, gr,
                          ["p_i", "pjn", "w2", "b2", "wg", "bg"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
            err_msg=f"grad mismatch: {name}")


def test_gradients_under_jit():
    p_i, pjn, nmask, w2, b2, wg, bg = _setup(3, n=9, b=3, d=4)

    @jax.jit
    def loss(p_i, w2):
        out = gn_ell_aggregate(p_i, pjn, nmask, w2, b2, wg, bg,
                               "silu", True)
        return jnp.mean(out ** 2)

    gk = jax.grad(loss, argnums=(0, 1))(p_i, w2)

    def loss_ref(p_i, w2):
        out = gn_ell_reference(p_i, pjn, nmask, w2, b2, wg, bg)
        return jnp.mean(out ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(p_i, w2)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=5e-5, atol=5e-5)


def test_bf16_inputs_close_to_f32_oracle():
    args32 = _setup(4, n=16, d=6)
    args16 = [a.astype(jnp.bfloat16) for a in args32[:2]] + \
        [args32[2]] + list(args32[3:])
    got = gn_ell_aggregate(*args16, "silu", True)
    want = gn_ell_reference(*args32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_layer_ell_pallas_matches_edge_list():
    """GatedGraphNetwork(neigh=) through the FORCED fused kernel ==
    the explicit edge-list forward/backward with identical params."""
    from sgp_tpu.graph.sparse import Graph, coalesce, padded_incoming
    from sgp_tpu.models import graph_layers
    from sgp_tpu.models.graph_layers import GatedGraphNetwork

    rng = np.random.default_rng(7)
    n = 12
    g = coalesce(Graph(rng.integers(0, n, 60).astype(np.int32),
                       rng.integers(0, n, 60).astype(np.int32),
                       rng.random(60).astype(np.float32), n))
    si, nm = padded_incoming(g)
    x = jnp.asarray(rng.standard_normal((2, n, 8)).astype(np.float32))
    layer = GatedGraphNetwork(output_size=8, sorted_edges=True)
    params = layer.init(jax.random.PRNGKey(0), x,
                        jnp.asarray(g.src), jnp.asarray(g.dst))
    neigh = (jnp.asarray(si), jnp.asarray(nm))

    out_coo = layer.apply(params, x, jnp.asarray(g.src),
                          jnp.asarray(g.dst))
    graph_layers.ELL_PALLAS = True           # force kernel (interpret)
    try:
        out_pl = layer.apply(params, x, neigh=neigh)

        def loss_pl(p):
            return (layer.apply(p, x, neigh=neigh) ** 2).sum()

        g_pl = jax.grad(loss_pl)(params)
    finally:
        graph_layers.ELL_PALLAS = None
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


def test_layer_ell_pallas_matches_ell_xla_bf16():
    """Same layer/params, fused kernel vs blocked-XLA ELL path, bf16
    message dtype (the shipped gatedgn_bf16 config)."""
    from sgp_tpu.graph.sparse import Graph, coalesce, padded_incoming
    from sgp_tpu.models import graph_layers
    from sgp_tpu.models.graph_layers import GatedGraphNetwork

    rng = np.random.default_rng(8)
    n = 10
    g = coalesce(Graph(rng.integers(0, n, 40).astype(np.int32),
                       rng.integers(0, n, 40).astype(np.int32),
                       rng.random(40).astype(np.float32), n))
    si, nm = padded_incoming(g)
    x = jnp.asarray(rng.standard_normal((3, n, 8)).astype(np.float32))
    layer = GatedGraphNetwork(output_size=16, dtype=jnp.bfloat16)
    neigh = (jnp.asarray(si), jnp.asarray(nm))
    params = layer.init(jax.random.PRNGKey(1), x, neigh=neigh)
    graph_layers.ELL_PALLAS = False
    try:
        out_xla = layer.apply(params, x, neigh=neigh)
    finally:
        graph_layers.ELL_PALLAS = None
    graph_layers.ELL_PALLAS = True
    try:
        out_pl = layer.apply(params, x, neigh=neigh)
    finally:
        graph_layers.ELL_PALLAS = None
    np.testing.assert_allclose(np.asarray(out_pl, np.float32),
                               np.asarray(out_xla, np.float32),
                               rtol=0.05, atol=0.05)

"""Model blocks and decoder models: shape/semantics oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgp_tpu.models import (ESNModel, FCRNNModel, GroupedLinear, LinearReadout,
                            RNNModel, SGPModel, StaticGraphEmbedding)
from sgp_tpu.models.blocks import MLP, ResidualMLP


def init_apply(model, *args, **kwargs):
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, *args, **kwargs)
    return params, model.apply(params, *args, **kwargs)


def test_grouped_linear_block_diagonal(rng):
    x = jnp.asarray(rng.standard_normal((5, 12)).astype(np.float32))
    m = GroupedLinear(output_size=8, groups=4)
    params, out = init_apply(m, x)
    assert out.shape == (5, 8)
    # oracle: apply each group separately
    w = params["params"]["kernel"]  # [4, 3, 2]
    b = params["params"]["bias"]
    expect = np.concatenate(
        [np.asarray(x)[:, g * 3:(g + 1) * 3] @ np.asarray(w[g])
         for g in range(4)], -1) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_linear_readout_shapes(rng):
    x = jnp.asarray(rng.standard_normal((3, 7, 16)).astype(np.float32))
    _, out = init_apply(LinearReadout(output_size=2, horizon=5), x)
    assert out.shape == (3, 5, 7, 2)
    # 4-dim input takes last step
    x4 = jnp.asarray(rng.standard_normal((3, 9, 7, 16)).astype(np.float32))
    m = LinearReadout(output_size=2, horizon=5)
    p = m.init(jax.random.PRNGKey(0), x4)
    out4 = m.apply(p, x4)
    out_last = m.apply(p, x4[:, -1])
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out_last),
                               atol=1e-6)


def test_mlp_residual_shapes(rng):
    x = jnp.asarray(rng.standard_normal((4, 6, 10)).astype(np.float32))
    _, out = init_apply(MLP(hidden_size=32, n_layers=2), x)
    assert out.shape == (4, 6, 32)
    _, out2 = init_apply(ResidualMLP(hidden_size=32, n_layers=2,
                                     parametrized_skip=True), x)
    assert out2.shape == (4, 6, 32)


def test_static_graph_embedding(rng):
    m = StaticGraphEmbedding(n_tokens=10, emb_size=4)
    params = m.init(jax.random.PRNGKey(0))
    full = m.apply(params)
    sub = m.apply(params, token_index=jnp.array([2, 7]))
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full)[[2, 7]])


def test_sgp_model_full_graph(rng):
    b, n, order, f = 4, 9, 3, 24
    x = jnp.asarray(rng.standard_normal((b, 1, n, f)).astype(np.float32))
    m = SGPModel(input_size=f, order=order, n_nodes=n, hidden_size=32,
                 mlp_size=16, output_size=1, n_layers=2, horizon=6,
                 positional_encoding=True, resnet=True)
    _, out = init_apply(m, x)
    assert out.shape == (b, 6, n, 1)


def test_sgp_model_iid(rng):
    b, n, order, f = 8, 9, 3, 24
    x = jnp.asarray(rng.standard_normal((b, 1, f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, b))
    m = SGPModel(input_size=f, order=order, n_nodes=n, hidden_size=32,
                 mlp_size=16, output_size=1, n_layers=1, horizon=6,
                 positional_encoding=True)
    rngk = jax.random.PRNGKey(0)
    params = m.init({"params": rngk, "dropout": rngk}, x, node_index=idx,
                    iid=True)
    out = m.apply(params, x, node_index=idx, iid=True)
    assert out.shape == (b, 6, 1)
    # IID per-pair forward must agree with full-graph forward on the
    # same features (same params): node i sampled -> same output
    xg = jnp.asarray(rng.standard_normal((1, 1, n, f)).astype(np.float32))
    out_full = m.apply(params, xg)
    out_iid = m.apply(params, xg[0, :, 3][None], node_index=jnp.array([3]),
                      iid=True)
    np.testing.assert_allclose(np.asarray(out_iid[0]),
                               np.asarray(out_full[0, :, 3]), atol=1e-5)


def test_sgp_model_with_exog(rng):
    b, n, order, f = 4, 9, 3, 24
    x = jnp.asarray(rng.standard_normal((b, 1, n, f)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal((b, 1, 2)).astype(np.float32))
    m = SGPModel(input_size=f, order=order, n_nodes=n, hidden_size=30,
                 mlp_size=16, output_size=1, n_layers=1, horizon=3,
                 positional_encoding=False, exog_size=2)
    rngk = jax.random.PRNGKey(0)
    params = m.init({"params": rngk, "dropout": rngk}, x, u=u)
    out = m.apply(params, x, u=u)
    assert out.shape == (b, 3, n, 1)


def test_esn_model(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 5, 1)).astype(np.float32))
    m = ESNModel.build(input_size=1, hidden_size=16, output_size=1,
                       exog_size=0, rec_layers=2, horizon=4)
    _, out = init_apply(m, x)
    assert out.shape == (2, 4, 5, 1)


def test_rnn_model(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 5, 1)).astype(np.float32))
    m = RNNModel(output_size=1, horizon=4, hidden_size=16, ff_size=16)
    _, out = init_apply(m, x)
    assert out.shape == (2, 4, 5, 1)


def test_fc_rnn_model(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 5, 1)).astype(np.float32))
    m = FCRNNModel(n_nodes=5, output_size=1, horizon=4, hidden_size=16,
                   ff_size=16)
    _, out = init_apply(m, x)
    assert out.shape == (2, 4, 5, 1)

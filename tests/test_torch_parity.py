"""Numerical parity with the reference's torch implementation.

BASELINE.json requires per-layer encoder activation allclose with
imported reservoir weights. Here the reference reservoir/GESN update
rules (``lib/nn/reservoir/reservoir.py:77-81``, ``graph_reservoir.py:
85-93``) are executed in actual torch (CPU) with torch-generated
weights; the weights are exported into our JAX modules via
``from_arrays`` and the full forward activations compared.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sgp_tpu.encode import GraphESN, Reservoir, sgp_spatial_embedding  # noqa: E402
from sgp_tpu.graph import Graph, add_self_loops, coalesce, normalize_adj  # noqa: E402
from sgp_tpu.ops import build_operator  # noqa: E402


def torch_reservoir_layers(sizes, seed=0, density=0.7, rho=0.9,
                           alphas=None):
    """Generate weights with torch RNG following reservoir.py:54-75."""
    torch.manual_seed(seed)
    out = []
    for i, (f_in, h) in enumerate(sizes):
        w_ih = torch.empty(h, f_in).uniform_(-1, 1)
        b_ih = torch.empty(h).uniform_(-1, 1)
        w_hh = torch.empty(h, h).uniform_(-1, 1)
        if density < 1:
            n_units = h * h
            mask = torch.ones(n_units)
            drop = torch.randperm(n_units)[:int(n_units * (1 - density))]
            mask[drop] = 0.0
            w_hh = w_hh * mask.view(h, h)
        abs_eigs = torch.linalg.eigvals(w_hh).abs()
        w_hh = w_hh * (rho / abs_eigs.max())
        out.append(dict(w_ih=w_ih, w_hh=w_hh, b_ih=b_ih,
                        alpha=alphas[i] if alphas else 0.9))
    return out


def torch_reservoir_forward(layers, x):
    """reservoir.py:158-186 executed in torch."""
    t, n, _ = x.shape
    xt = torch.as_tensor(x)
    h = [torch.zeros(n, l["w_hh"].shape[0]) for l in layers]
    outs = []
    with torch.no_grad():
        for s in range(t):
            inp = xt[s]
            for i, l in enumerate(layers):
                pre = torch.nn.functional.linear(inp, l["w_ih"], l["b_ih"]) \
                    + torch.nn.functional.linear(h[i], l["w_hh"])
                h[i] = (1 - l["alpha"]) * h[i] + l["alpha"] * torch.tanh(pre)
                inp = h[i]
            outs.append(torch.cat(h, -1))
    return torch.stack(outs).numpy()


def test_reservoir_activations_match_torch(rng):
    layers = torch_reservoir_layers([(3, 16), (16, 16)], seed=1,
                                    alphas=[0.9, 0.8])
    x = rng.standard_normal((40, 7, 3)).astype(np.float32)
    expect = torch_reservoir_forward(layers, x)
    res = Reservoir.from_arrays(
        [{k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in l.items()} for l in layers])
    got = np.asarray(res(jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_spatial_propagation_matches_torch_dense(rng):
    """K-hop propagation vs torch dense matmul chain with the same
    row-normalized operator (sgp_preprocessing.py:200-203)."""
    g = coalesce(Graph(rng.integers(0, 15, 60), rng.integers(0, 15, 60),
                       rng.random(60).astype(np.float32), 15))
    gn = normalize_adj(g, "row")
    a_t = torch.as_tensor(gn.to_dense())
    x = rng.standard_normal((6, 15, 8)).astype(np.float32)
    res = sgp_spatial_embedding(jnp.asarray(x), g, k=3)
    cur = torch.as_tensor(x)
    with torch.no_grad():
        for j in range(1, 4):
            cur = torch.einsum("ij,tjf->tif", a_t, cur)
            np.testing.assert_allclose(np.asarray(res[j]), cur.numpy(),
                                       atol=2e-5)


def torch_gesn_forward(layers, x, a_dense):
    t, n, _ = x.shape
    xt = torch.as_tensor(x)
    at = torch.as_tensor(a_dense)
    h = [torch.zeros(n, l["w_hh"].shape[0]) for l in layers]
    outs = []
    with torch.no_grad():
        for s in range(t):
            inp = xt[s]
            for i, l in enumerate(layers):
                rec = at @ torch.nn.functional.linear(h[i], l["w_hh"])
                pre = torch.nn.functional.linear(inp, l["w_ih"],
                                                 l["b_ih"]) + rec
                h[i] = (1 - l["alpha"]) * h[i] + l["alpha"] * torch.tanh(pre)
                inp = h[i]
            outs.append(torch.cat(h, -1))
    return torch.stack(outs).numpy()


def test_gesn_activations_match_torch(rng):
    g = coalesce(Graph(rng.integers(0, 10, 40), rng.integers(0, 10, 40),
                       rng.random(40).astype(np.float32), 10))
    gn = normalize_adj(add_self_loops(g), "row")
    layers = torch_reservoir_layers([(2, 12), (12, 12)], seed=3,
                                    alphas=[0.9, 0.9])
    x = rng.standard_normal((25, 10, 2)).astype(np.float32)
    expect = torch_gesn_forward(layers, x, gn.to_dense())
    gesn = GraphESN.from_arrays(
        [{k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in l.items()} for l in layers])
    got = np.asarray(gesn(jnp.asarray(x), build_operator(gn, "dense")))
    np.testing.assert_allclose(got, expect, atol=5e-5)

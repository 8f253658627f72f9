"""Boundary halo-exchange propagation (SURVEY.md §5.8): node-sharded
K-hop == single-device dense result; exchanged bytes ≪ full all-gather
on a localized graph."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgp_tpu.graph import Graph, coalesce, normalize_adj
from sgp_tpu.ops import build_operator
from sgp_tpu.parallel import make_mesh
from sgp_tpu.parallel.halo import build_halo_spec, halo_khop, shard_nodes

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def random_graph(rng, n=40, e=300):
    return normalize_adj(coalesce(Graph(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.random(e).astype(np.float32), n)), "row")


def ring_graph(n=64, width=2):
    """A banded (localized) graph: node i connects to i±1..width."""
    src, dst = [], []
    for i in range(n):
        for d in range(1, width + 1):
            src += [i, i]
            dst += [(i + d) % n, (i - d) % n]
    return normalize_adj(coalesce(Graph(
        np.array(src), np.array(dst),
        np.ones(len(src), np.float32), n)), "row")


@pytest.mark.parametrize("n,k,mesh_shape", [(40, 1, (1, 4)), (37, 2, (2, 4)),
                                            (64, 3, (1, 8))])
def test_halo_khop_matches_dense(rng, n, k, mesh_shape):
    g = random_graph(rng, n=n)
    mesh = make_mesh(*mesh_shape)
    axis = "model"
    spec = build_halo_spec(g, mesh.shape[axis])
    op = build_operator(g, "dense")
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    expect = np.asarray(x)
    for _ in range(k):
        expect = np.asarray(op @ jnp.asarray(expect))
    xs = shard_nodes(x, mesh, axis)
    with mesh:
        out = halo_khop(spec, xs, mesh, k=k, axis=axis)
    np.testing.assert_allclose(np.asarray(out)[:n], expect, atol=1e-5)


def test_halo_khop_batched_and_concat(rng):
    g = random_graph(rng, n=32)
    mesh = make_mesh(1, 8)
    spec = build_halo_spec(g, 8)
    op = build_operator(g, "dense")
    x = jnp.asarray(rng.standard_normal((5, 32, 8)).astype(np.float32))
    h1 = op @ x
    expect = np.concatenate([np.asarray(x), np.asarray(h1),
                             np.asarray(op @ h1)], -1)
    xs = shard_nodes(x, mesh, "model")
    with mesh:
        out = halo_khop(spec, xs, mesh, k=2, axis="model", concat=True)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_halo_bytes_much_less_than_allgather():
    """On a banded graph each shard only needs a handful of boundary
    rows — the point of halo exchange over full all-gather."""
    g = ring_graph(n=256, width=2)
    spec = build_halo_spec(g, 8)
    feat = 128
    assert spec.bytes_per_hop(feat) < spec.dense_gather_bytes(feat) / 4
    # per-pair boundary counts: only adjacent shards talk, few rows
    assert spec.b_max <= 4
    off = spec.boundary_counts.copy()
    for i in range(8):
        off[i, i] = 0
        off[i, (i + 1) % 8] = 0
        off[i, (i - 1) % 8] = 0
    assert off.sum() == 0  # no exchange beyond adjacent shards


def test_halo_correct_output_sharding(rng):
    g = random_graph(rng, n=48)
    mesh = make_mesh(1, 8)
    spec = build_halo_spec(g, 8)
    x = jnp.asarray(rng.standard_normal((48, 8)).astype(np.float32))
    xs = shard_nodes(x, mesh, "model")
    with mesh:
        out = halo_khop(spec, xs, mesh, k=1, axis="model")
    assert len(out.addressable_shards) == 8


def test_halo_spec_fuzz_matches_dense(rng):
    """Seeded fuzz over graph sizes/densities/shard counts (incl.
    explicit zero-weight edges, ragged tails, empty cross-blocks): the
    CSR-built halo plan always reproduces dense K-hop propagation."""
    for trial in range(12):
        n = int(rng.integers(5, 49))
        e = int(rng.integers(n, 6 * n))
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        w = rng.random(e).astype(np.float32)
        w[rng.random(e) < 0.15] = 0.0          # stored zeros
        g = normalize_adj(coalesce(Graph(src, dst, w, n)), "row")
        shards = int(rng.choice([2, 4, 8]))
        k = int(rng.integers(1, 4))
        mesh = make_mesh(8 // shards, shards)
        spec = build_halo_spec(g, shards)
        x = rng.standard_normal((6, n, 3)).astype(np.float32)
        op = build_operator(g, "dense")
        expect = jnp.asarray(x)
        outs = []
        for _ in range(k):
            expect = op @ expect
            outs.append(expect)
        expect = np.asarray(jnp.concatenate(outs, -1))
        xs = shard_nodes(jnp.asarray(x), mesh, "model")
        with mesh:
            got = halo_khop(spec, xs, mesh, k=k, axis="model",
                            concat=True)
        got = np.asarray(got)[:, :n, x.shape[-1]:]   # drop input block
        np.testing.assert_allclose(got, expect, atol=3e-5,
                                   err_msg=f"trial={trial} n={n} "
                                           f"shards={shards} k={k}")

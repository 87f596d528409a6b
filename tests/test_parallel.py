"""Distribution layer: partitioning invariants, halo-exchange SpMM, and a
full distributed training step on a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stgraph_tpu.parallel import (
    dist_spmm,
    make_mesh,
    partition_edges,
    shard_node_array,
)


@pytest.fixture
def setup(rng):
    n, e, f, p = 500, 3000, 16, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = rng.standard_normal((n, f)).astype(np.float32)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    return dg, mesh, h, a, n


def test_partition_covers_all_edges(rng):
    n, e, p = 100, 400, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    total = sum(int(x) for x in np.asarray(dg.local_csr.num_edges))
    assert total == e
    # every shard's rows stay inside its range
    rows = np.asarray(dg.local_csr.rows)
    for pp in range(p):
        real = rows[pp] < dg.nodes_per_shard
        assert (rows[pp][real] >= 0).all()


def test_dist_spmm_matches_dense(setup):
    dg, mesh, h, a, n = setup
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    out = jax.jit(lambda x: dist_spmm(mesh, dg, x))(hs)
    np.testing.assert_allclose(np.asarray(out)[:n], a @ h, rtol=1e-4, atol=1e-4)


def test_dist_spmm_grad_matches_dense(setup):
    dg, mesh, h, a, n = setup
    hs = shard_node_array(mesh, jnp.asarray(h), dg)

    def loss(x):
        return (dist_spmm(mesh, dg, x) ** 2).sum()

    g = jax.jit(jax.grad(loss))(hs)
    gd = jax.grad(lambda x: ((jnp.asarray(a) @ x) ** 2).sum())(jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(g)[:n], np.asarray(gd), rtol=1e-4, atol=1e-4)


def test_dist_output_sharding_preserved(setup):
    dg, mesh, h, a, n = setup
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    out = jax.jit(lambda x: dist_spmm(mesh, dg, x))(hs)
    assert "graph" in str(out.sharding)


def test_make_mesh():
    mesh = make_mesh(graph=4, data=2)
    assert mesh.shape == {"data": 2, "graph": 4}
    with pytest.raises(ValueError):
        make_mesh(graph=64, data=64)


def test_full_distributed_train_step():
    """The driver-facing dryrun on the virtual mesh must run end to end."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_uneven_nodes_partition(rng):
    # num_nodes not divisible by shards: padded tail must not corrupt sums.
    n, e, p = 13, 40, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = rng.standard_normal((n, 4)).astype(np.float32)
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    out = np.asarray(jax.jit(lambda x: dist_spmm(mesh, dg, x))(hs))[:n]
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    np.testing.assert_allclose(out, a @ h, rtol=1e-4, atol=1e-4)


def test_overlap_split_matches_combined(rng):
    """interior+frontier formulation == single widened reduction == dense."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import dist_spmm, partition_edges, shard_node_array

    n, e, p = 96, 400, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
    hs = shard_node_array(mesh, h, dg)
    out_overlap = dist_spmm(mesh, dg, hs, overlap=True)
    out_combined = dist_spmm(mesh, dg, hs, overlap=False)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    dense = a @ np.asarray(h)
    np.testing.assert_allclose(
        np.asarray(out_overlap)[:n], dense, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_overlap), np.asarray(out_combined), rtol=1e-5, atol=1e-5
    )


def test_dist_tgcn_cell_matches_local(rng):
    """dist_tgcn_cell over an 8-device mesh == same math on one device."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops import message as M
    from stgraph_tpu.parallel import partition_edges, shard_node_array
    from stgraph_tpu.parallel.layers import dist_tgcn_cell, dist_tgcn_params

    n, e, p, fin, fout = 64, 256, 4, 6, 5
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    params = dist_tgcn_params(jax.random.key(0), fin, fout)
    x = jnp.asarray(rng.standard_normal((n, fin)).astype(np.float32))
    norm = jnp.asarray((rng.random((n, 1)) + 0.5).astype(np.float32))
    hid = jnp.asarray(rng.standard_normal((n, fout)).astype(np.float32))

    xs = shard_node_array(mesh, x, dg)
    norms = shard_node_array(mesh, norm, dg)
    hids = shard_node_array(mesh, hid, dg)
    out = dist_tgcn_cell(mesh, dg, params, xs, norms, hids)

    # Local oracle with the same parameters on the unpartitioned graph.
    csr = build_csr(src, dst, n)

    def gate(name, inp, h_):
        g = M.spmm(csr, (inp @ params[f"conv_{name}"]["weight"]) * norm,
                   impl="jnp") * norm
        g = g + params[f"conv_{name}"]["bias"]
        g = jnp.clip(g, -1e6, 1e6)
        lin = params[f"lin_{name}"]
        return jnp.concatenate([g, h_], axis=1) @ lin["weight"] + lin["bias"]

    z = jax.nn.sigmoid(gate("z", x, hid))
    r = jax.nn.sigmoid(gate("r", x, hid))
    h_tilde = jnp.tanh(gate("h", x, hid * r))
    expect = z * hid + (1 - z) * h_tilde
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(expect), rtol=1e-4, atol=1e-4
    )


def test_dist_spmm_pallas_matches_jnp(rng):
    """Per-shard blocked-kernel aggregation (interpret) == jnp path."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import dist_spmm, partition_edges, shard_node_array

    n, e, p = 96, 500, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = jnp.asarray(rng.standard_normal((n, 6)).astype(np.float32))
    hs = shard_node_array(mesh, h, dg)
    out_jnp = dist_spmm(mesh, dg, hs, impl="jnp")
    out_pl = dist_spmm(mesh, dg, hs, impl="pallas", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_jnp), rtol=1e-4, atol=1e-4
    )


def test_launch_single_host():
    from stgraph_tpu.parallel import launch

    launch.initialize()  # no-op single host
    info = launch.process_info()
    assert info["process_count"] >= 1
    assert not launch.is_multihost()


def test_dist_spmm_pallas_grads_match_jnp(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import dist_spmm, partition_edges, shard_node_array

    n, e, p = 64, 300, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
    hs = shard_node_array(mesh, h, dg)

    def loss(hh, impl):
        return (dist_spmm(mesh, dg, hh, impl=impl, interpret=True) ** 2).sum()

    g_pl = jax.grad(lambda hh: loss(hh, "pallas"))(hs)
    g_j = jax.grad(lambda hh: loss(hh, "jnp"))(hs)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_j), rtol=1e-4, atol=1e-4
    )


def test_dist_spmm_weighted_matches_dense(rng):
    """Weighted dist_spmm (per-edge data routed via global-edge-id maps)
    == dense weighted aggregation."""
    from stgraph_tpu.parallel import shard_edge_array

    n, e, p, f = 96, 400, 4, 6
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.standard_normal(e).astype(np.float32)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = rng.standard_normal((n, f)).astype(np.float32)
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    ws = shard_edge_array(mesh, jnp.asarray(w), dg, "local")
    out = np.asarray(
        jax.jit(lambda x, ww: dist_spmm(mesh, dg, x, edge_weight=ww))(hs, ws)
    )[:n]
    a = np.zeros((n, n), np.float32)
    for i, (s, d) in enumerate(zip(src, dst)):
        a[d, s] += w[i]
    np.testing.assert_allclose(out, a @ h, rtol=1e-4, atol=1e-4)


def test_dist_spmm_multihead_weighted(rng):
    """(P·Ns, H, F) features with per-edge-per-head weights == per-head
    dense oracle."""
    from stgraph_tpu.parallel import shard_edge_array

    n, e, p, heads, f = 64, 300, 4, 3, 5
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.standard_normal((e, heads)).astype(np.float32)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = rng.standard_normal((n, heads, f)).astype(np.float32)
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    ws = shard_edge_array(mesh, jnp.asarray(w), dg, "local")
    out = np.asarray(
        jax.jit(lambda x, ww: dist_spmm(mesh, dg, x, edge_weight=ww))(hs, ws)
    )[:n]
    want = np.zeros((n, heads, f), np.float32)
    for i, (s, d) in enumerate(zip(src, dst)):
        want[d] += w[i][:, None] * h[s]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_dist_gat_matches_local_oracle(rng):
    """dist_gat_attention == the single-device dense GAT attention oracle,
    values AND gradients (VERDICT round-1 item 3's done-criterion)."""
    from stgraph_tpu.graph.csr import build_csr
    from stgraph_tpu.ops.attention import dense_gat_attention
    from stgraph_tpu.parallel import dist_gat_attention

    n, e, p, heads, f = 96, 500, 4, 2, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    csr = build_csr(src, dst, n)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    el = rng.standard_normal((n, heads)).astype(np.float32)
    er = rng.standard_normal((n, heads)).astype(np.float32)
    fs = rng.standard_normal((n, heads, f)).astype(np.float32)
    els = shard_node_array(mesh, jnp.asarray(el), dg)
    ers = shard_node_array(mesh, jnp.asarray(er), dg)
    fss = shard_node_array(mesh, jnp.asarray(fs), dg)

    out = np.asarray(
        jax.jit(lambda a, b, c: dist_gat_attention(mesh, dg, a, b, c))(
            els, ers, fss
        )
    )[:n]
    want = np.asarray(
        dense_gat_attention(
            csr, jnp.asarray(el)[..., None], jnp.asarray(er)[..., None],
            jnp.asarray(fs),
        )
    )
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    # gradients (halo transpose synthesized by JAX through the ppermutes)
    gref = jnp.asarray(rng.standard_normal((dg.padded_nodes, heads, f)), jnp.float32)

    def loss_dist(a, b, c):
        return jnp.sum(dist_gat_attention(mesh, dg, a, b, c) * gref)

    def loss_dense(a, b, c):
        return jnp.sum(
            dense_gat_attention(csr, a[..., None], b[..., None], c)
            * gref[:n]
        )

    gd = jax.jit(jax.grad(loss_dist, argnums=(0, 1, 2)))(els, ers, fss)
    gl = jax.grad(loss_dense, argnums=(0, 1, 2))(
        jnp.asarray(el), jnp.asarray(er), jnp.asarray(fs)
    )
    for got, want_g in zip(gd, gl):
        np.testing.assert_allclose(
            np.asarray(got)[:n], np.asarray(want_g), rtol=1e-3, atol=1e-3
        )


def test_dist_gat_conv_runs(rng):
    """Full distributed GAT layer executes and returns finite output."""
    from stgraph_tpu.parallel import dist_gat_conv, dist_gat_params

    n, e, p = 64, 300, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = rng.standard_normal((n, 8)).astype(np.float32)
    hs = shard_node_array(mesh, jnp.asarray(h), dg)
    params = dist_gat_params(jax.random.key(0), 8, 4, num_heads=2)
    out = jax.jit(lambda x: dist_gat_conv(mesh, dg, params, x))(hs)
    assert out.shape == (dg.padded_nodes, 2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_per_pair_halo_comm_volume(rng):
    """Per-displacement halo sizing ships no more than the old global-max
    all_to_all, and strictly less on a skewed graph."""
    n, p = 400, 8
    ns = -(-n // p)
    # Locality-skewed: almost all cross-shard edges connect ADJACENT shard
    # ranges (displacement 1) — the common case after any locality-aware
    # node ordering — plus a sprinkle of long-range edges.
    dst = rng.integers(0, n, 2000)
    src = np.minimum(
        (dst // ns - 1) * ns + rng.integers(0, ns, 2000), n - 1
    ).clip(0)
    extra_s = rng.integers(0, n, 40)
    extra_d = rng.integers(0, n, 40)
    dg = partition_edges(
        np.concatenate([src, extra_s]), np.concatenate([dst, extra_d]), n, p
    )
    per_d = [s.shape[1] for s in dg.send_idx_by_d]
    global_max = max(per_d)
    assert sum(per_d) == dg.halo_total
    assert dg.halo_total <= (p - 1) * global_max
    # Skew means most displacements need far less than the max.
    assert dg.halo_total < 0.8 * (p - 1) * global_max


def test_dist_spmm_pallas_weighted_multihead(rng):
    """Weighted + multihead per-shard rowmask aggregation (interpret)
    matches the jnp path, values and gradients."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import (
        dist_spmm,
        partition_edges,
        shard_edge_array,
        shard_node_array,
    )

    n, e, p, heads, f = 96, 600, 4, 2, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((e, heads)).astype(np.float32))
    hs = shard_node_array(mesh, h, dg)
    ws = shard_edge_array(mesh, w, dg, "local")
    out_jnp = dist_spmm(mesh, dg, hs, edge_weight=ws, impl="jnp")
    out_pl = dist_spmm(
        mesh, dg, hs, edge_weight=ws, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_jnp), rtol=1e-4, atol=1e-4
    )

    def loss(fn_impl):
        def f_(hh, ww):
            out = dist_spmm(
                mesh, dg, hh, edge_weight=ww, impl=fn_impl,
                interpret=fn_impl == "pallas",
            )
            return jnp.sum(out**2)

        return f_

    gh_p, gw_p = jax.grad(loss("pallas"), argnums=(0, 1))(hs, ws)
    gh_j, gw_j = jax.grad(loss("jnp"), argnums=(0, 1))(hs, ws)
    np.testing.assert_allclose(
        np.asarray(gh_p), np.asarray(gh_j), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gw_p), np.asarray(gw_j), rtol=1e-3, atol=1e-3
    )


def test_dist_spmm_pallas_weighted_singlehead(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import (
        dist_spmm,
        partition_edges,
        shard_edge_array,
        shard_node_array,
    )

    n, e, p = 80, 400, 4
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    h = jnp.asarray(rng.standard_normal((n, 10)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((e,)).astype(np.float32))
    hs = shard_node_array(mesh, h, dg)
    ws = shard_edge_array(mesh, w, dg, "local")
    out_jnp = dist_spmm(mesh, dg, hs, edge_weight=ws, impl="jnp")
    out_pl = dist_spmm(
        mesh, dg, hs, edge_weight=ws, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_jnp), rtol=1e-4, atol=1e-4
    )


def test_dist_gat_pallas_matches_jnp(rng):
    """dist_gat_attention with the per-shard rowmask aggregation
    (interpret) == the jnp per-shard path, values and gradients."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from stgraph_tpu.parallel import partition_edges, shard_node_array
    from stgraph_tpu.parallel.halo import dist_gat_attention

    n, e, p, h, f = 96, 500, 4, 2, 64
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dg = partition_edges(src, dst, n, p)
    mesh = Mesh(np.asarray(jax.devices()[:p]), ("graph",))
    el = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    els = shard_node_array(mesh, el, dg)
    ers = shard_node_array(mesh, er, dg)
    fss = shard_node_array(mesh, fs, dg)

    out_j = dist_gat_attention(mesh, dg, els, ers, fss)
    out_p = dist_gat_attention(
        mesh, dg, els, ers, fss, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_j), rtol=1e-4, atol=1e-4
    )

    def loss(impl):
        def f_(a, b, c):
            out = dist_gat_attention(
                mesh, dg, a, b, c, impl=impl,
                interpret=impl == "pallas",
            )
            return jnp.sum(out**2)

        return f_

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(els, ers, fss)
    gj = jax.grad(loss("jnp"), argnums=(0, 1, 2))(els, ers, fss)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )

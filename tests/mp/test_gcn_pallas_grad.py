"""Gradient parity through the Pallas GCN path (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.graph import from_graphs
from tgp_tpu.mp.gcn import GCNConv
from tests.utils_graphs import erdos_renyi_graph


def test_gcn_pallas_grad_matches():
    # GCNConv's sparse Pallas path auto-interprets on the cpu backend, so
    # the kernel runs in interpret mode here without monkeypatching
    graphs = [erdos_renyi_graph(12, p=0.4, num_features=5, seed=i)
              for i in range(2)]
    b_plain = from_graphs(graphs, pad_nodes=32, pad_edges=256)
    b_sorted = from_graphs(graphs, pad_nodes=32, pad_edges=256,
                           sort_edges=True)

    conv_x = GCNConv(8, use_pallas=False)
    conv_p = GCNConv(8, use_pallas=True)
    params = conv_x.init(jax.random.key(0), b_plain)

    def loss_x(p):
        return jnp.sum(conv_x.apply(p, b_plain) ** 2)

    def loss_p(p):
        return jnp.sum(conv_p.apply(p, b_sorted) ** 2)

    gx = jax.grad(loss_x)(params)
    gp = jax.grad(loss_p)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-3)

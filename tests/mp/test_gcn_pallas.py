"""GCNConv Pallas path parity vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tgp_tpu.mp.gcn import GCNConv
from tgp_tpu.ops.pallas import segment_spmm
from tests.utils_graphs import erdos_renyi_graph
from tgp_tpu.graph import from_graphs


def test_gcn_pallas_matches_xla(monkeypatch):
    # force interpret mode inside the kernel for CPU tests
    orig = segment_spmm.sorted_segment_sum_pallas
    monkeypatch.setattr(
        segment_spmm, "sorted_segment_sum_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    graphs = [erdos_renyi_graph(14, p=0.4, num_features=6, seed=i)
              for i in range(3)]
    b_plain = from_graphs(graphs, pad_nodes=48, pad_edges=256)
    b_sorted = from_graphs(graphs, pad_nodes=48, pad_edges=256,
                           sort_edges=True)
    assert b_sorted.edges_sorted and not b_plain.edges_sorted

    conv_x = GCNConv(8, use_pallas=False)
    conv_p = GCNConv(8, use_pallas=True)
    params = conv_x.init(jax.random.key(0), b_plain)
    out_x = conv_x.apply(params, b_plain)
    out_p = conv_p.apply(params, b_sorted)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=2e-3, atol=2e-3)

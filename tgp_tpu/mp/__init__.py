"""Message-passing layers (reference: tgp/mp/)."""
from tgp_tpu.mp.gcn import GCNConv, GraphConv, gcn_norm

__all__ = ["GCNConv", "GraphConv", "gcn_norm"]

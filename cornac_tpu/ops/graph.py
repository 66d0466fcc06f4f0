"""Bipartite-graph propagation primitives for graph CF models.

TPU-native replacement for the reference's DGL message passing
(``models/lightgcn/lightgcn.py:44-130``): the normalized adjacency is kept
as flat edge arrays + precomputed 1/sqrt(du*di) weights; one propagation
step is two gather/scatter-add passes under jit (segment-sum form — XLA
lowers these to efficient sorted scatters; a Pallas kernel is the escalation
path for very large graphs).
"""

import jax.numpy as jnp
import numpy as np


def build_norm_edges(train_set):
    """(users, items, norm) edge arrays with symmetric-normalized weights."""
    u, i, _ = train_set.uir_tuple
    du = np.zeros(train_set.num_users)
    di = np.zeros(train_set.num_items)
    np.add.at(du, u, 1)
    np.add.at(di, i, 1)
    norm = 1.0 / np.sqrt(np.maximum(du[u] * di[i], 1.0))
    return (
        jnp.asarray(u, dtype=jnp.int32),
        jnp.asarray(i, dtype=jnp.int32),
        jnp.asarray(norm, dtype=jnp.float32),
    )


def propagate(user_emb, item_emb, edge_u, edge_i, edge_norm):
    """One symmetric-normalized bipartite propagation step."""
    msg_to_items = (
        jnp.zeros_like(item_emb)
        .at[edge_i]
        .add(user_emb[edge_u] * edge_norm[:, None])
    )
    msg_to_users = (
        jnp.zeros_like(user_emb)
        .at[edge_u]
        .add(item_emb[edge_i] * edge_norm[:, None])
    )
    return msg_to_users, msg_to_items


def lightgcn_embeddings(user_emb, item_emb, edge_u, edge_i, edge_norm, num_layers):
    """Mean of layer-0..K embeddings under LightGCN propagation."""
    ue_acc, ie_acc = user_emb, item_emb
    ue, ie = user_emb, item_emb
    for _ in range(num_layers):
        ue, ie = propagate(ue, ie, edge_u, edge_i, edge_norm)
        ue_acc = ue_acc + ue
        ie_acc = ie_acc + ie
    return ue_acc / (num_layers + 1), ie_acc / (num_layers + 1)

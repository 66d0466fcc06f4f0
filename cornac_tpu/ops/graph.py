"""Bipartite-graph propagation primitives for graph CF models.

TPU-native replacement for the reference's DGL message passing
(``models/lightgcn/lightgcn.py:44-130``). Two device representations of
the symmetric-normalized adjacency, selected automatically by
:class:`NormAdjacency`:

- **dense** (small graphs): the (num_users, num_items) normalized matrix
  lives in HBM and one propagation step is two MXU matmuls — measured
  ~7x faster than the scatter form (fwd+bwd, ML-100K shape, v5e);
- **edges** (large graphs): flat edge arrays + 1/sqrt(du*di) weights,
  propagation as gather/scatter-add passes (XLA sorted scatters); memory
  is O(edges) instead of O(users*items).
"""

import jax.numpy as jnp
import numpy as np

# dense adjacency budget: num_users * num_items cells (f32) — 5e7 ≈ 200 MB
DENSE_ADJ_BUDGET = 50_000_000


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
    """One symmetric-normalized bipartite propagation step (edge form)."""
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
    """Mean of layer-0..K embeddings under LightGCN propagation (edge form)."""
    ue_acc, ie_acc = user_emb, item_emb
    ue, ie = user_emb, item_emb
    for _ in range(num_layers):
        ue, ie = propagate(ue, ie, edge_u, edge_i, edge_norm)
        ue_acc = ue_acc + ue
        ie_acc = ie_acc + ie
    return ue_acc / (num_layers + 1), ie_acc / (num_layers + 1)


class NormAdjacency:
    """Symmetric-normalized bipartite adjacency with an automatically
    chosen device representation (see module docstring). Safe to close over
    in jitted functions — holds device arrays only."""

    def __init__(self, train_set, budget_elems=DENSE_ADJ_BUDGET):
        self.num_users = train_set.num_users
        self.num_items = train_set.num_items
        self.edge_u, self.edge_i, self.edge_norm = build_norm_edges(train_set)
        self.dense = None
        if self.num_users * self.num_items <= budget_elems:
            A = np.zeros((self.num_users, self.num_items), np.float32)
            u, i, _ = train_set.uir_tuple
            np.add.at(A, (u, i), np.asarray(self.edge_norm))
            self.dense = jnp.asarray(A)

    def propagate(self, user_emb, item_emb):
        """One propagation step: (messages to users, messages to items)."""
        if self.dense is not None:
            return self.dense @ item_emb, self.dense.T @ user_emb
        return propagate(
            user_emb, item_emb, self.edge_u, self.edge_i, self.edge_norm
        )

    def lightgcn(self, user_emb, item_emb, num_layers):
        """Mean of layer-0..K embeddings under LightGCN propagation."""
        ue_acc, ie_acc = user_emb, item_emb
        ue, ie = user_emb, item_emb
        for _ in range(num_layers):
            ue, ie = self.propagate(ue, ie)
            ue_acc = ue_acc + ue
            ie_acc = ie_acc + ie
        return ue_acc / (num_layers + 1), ie_acc / (num_layers + 1)

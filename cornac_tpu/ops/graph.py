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


def _mesh_all_axes_spec(mesh, trailing_dims=0):
    """PartitionSpec sharding a leading dim over every mesh axis."""
    from jax.sharding import PartitionSpec as P

    return P(tuple(mesh.axis_names), *([None] * trailing_dims))


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
    in jitted functions — holds device arrays only.

    With ``mesh=`` the adjacency is SHARDED across the mesh (the north-star
    multi-chip layout): the flat edge list is partitioned over all mesh
    devices (padded with zero-weight self-edges), or — inside the dense
    budget — the dense normalized matrix is row-partitioned. Propagation
    stays the same program; GSPMD turns the per-shard scatter-adds /
    matmuls into local work plus one psum (edges) or all-gather (dense
    rows) per step, riding ICI."""

    def __init__(self, train_set, budget_elems=DENSE_ADJ_BUDGET, mesh=None):
        import jax
        from jax.sharding import NamedSharding

        self.num_users = train_set.num_users
        self.num_items = train_set.num_items
        self.mesh = mesh
        self.edge_u, self.edge_i, self.edge_norm = build_norm_edges(train_set)
        if mesh is not None:
            n_dev = mesh.size
            pad = (-self.edge_u.shape[0]) % n_dev
            if pad:
                # zero-weight pad edges contribute nothing to either side
                zi = jnp.zeros(pad, jnp.int32)
                self.edge_u = jnp.concatenate([self.edge_u, zi])
                self.edge_i = jnp.concatenate([self.edge_i, zi])
                self.edge_norm = jnp.concatenate(
                    [self.edge_norm, jnp.zeros(pad, jnp.float32)]
                )
            shard = NamedSharding(mesh, _mesh_all_axes_spec(mesh))
            self.edge_u = jax.device_put(self.edge_u, shard)
            self.edge_i = jax.device_put(self.edge_i, shard)
            self.edge_norm = jax.device_put(self.edge_norm, shard)
        self.dense = None
        if self.num_users * self.num_items <= budget_elems:
            A = np.zeros((self.num_users, self.num_items), np.float32)
            u, i, _ = train_set.uir_tuple
            norm = 1.0 / np.sqrt(
                np.maximum(
                    np.bincount(u, minlength=self.num_users)[u]
                    * np.bincount(i, minlength=self.num_items)[i],
                    1.0,
                )
            )
            np.add.at(A, (u, i), norm)
            if mesh is not None:
                # row-partition over every mesh device; zero pad rows are
                # inert (sliced off / multiplied by zero in propagate)
                pad = (-A.shape[0]) % mesh.size
                if pad:
                    A = np.concatenate(
                        [A, np.zeros((pad, A.shape[1]), np.float32)]
                    )
                self.dense = jax.device_put(
                    jnp.asarray(A),
                    NamedSharding(mesh, _mesh_all_axes_spec(mesh, 1)),
                )
            else:
                self.dense = jnp.asarray(A)

    def propagate(self, user_emb, item_emb):
        """One propagation step: (messages to users, messages to items)."""
        if self.dense is not None:
            nu = user_emb.shape[0]
            if self.dense.shape[0] != nu:  # mesh row padding
                pad = self.dense.shape[0] - nu
                user_emb_p = jnp.concatenate(
                    [user_emb, jnp.zeros((pad, user_emb.shape[1]), user_emb.dtype)]
                )
                return (self.dense @ item_emb)[:nu], self.dense.T @ user_emb_p
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

"""DNNTSP — Deep Neural Network for Temporal Set Prediction
(Yu et al., KDD 2020).

Capability parity with reference ``cornac/models/dnntsp/recom_dnntsp.py:19``
+ ``dnntsp/dnntsp.py`` (torch+DGL: per-user dynamic item co-occurrence
graphs, weighted GCN over each timestep, causal masked self-attention over
time, learned temporal aggregation, global gated update against the full
item embedding table, BPR/MSE/weighted-MSE losses).

TPU redesign: no DGL — each user's graph is a padded dense block: node ids
``(B, N)``, per-timestep edge weights ``(B, T, N, N)`` (the reference
builds exactly this density per user through DGL message passing), so the
weighted GCN is one ``btnm,bme->btne`` einsum on the MXU and the whole
batch runs as a single compiled program.  BatchNorm uses the statistics of
the evaluation/training batch (the reference's BatchNorm1d in train mode;
documented deviation: no running-average inference stats — scores are
computed with the same batch-stat normalization).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from .recommender import NextBasketRecommender

BN_EPS = 1e-5
N_HEADS = 4


def _glorot(rng, shape):
    bound = float(np.sqrt(6.0 / (shape[0] + shape[1])))
    return jnp.asarray(rng.uniform(-bound, bound, size=shape).astype(np.float32))


def _init_params(rng, n_items, E):
    return {
        "emb": jnp.asarray(
            rng.normal(0, 1.0, size=(n_items, E)).astype(np.float32)
        ),
        # two WeightedGraphConv layers (hidden [E] + output E)
        "gcn_w": [_glorot(rng, (E, E)), _glorot(rng, (E, E))],
        "gcn_b": [jnp.zeros((E,), jnp.float32), jnp.zeros((E,), jnp.float32)],
        "bn_scale": [jnp.ones((E,), jnp.float32), jnp.ones((E,), jnp.float32)],
        "bn_offset": [jnp.zeros((E,), jnp.float32), jnp.zeros((E,), jnp.float32)],
        "Wq": _glorot(rng, (E, E)),
        "Wk": _glorot(rng, (E, E)),
        "Wv": _glorot(rng, (E, E)),
        "Wagg": _glorot(rng, (E, 1)),
        "alpha": jnp.asarray(
            rng.rand(n_items, 1).astype(np.float32)
        ),
        "fc_w": _glorot(rng, (E, 1)),
        "fc_b": jnp.zeros((1,), jnp.float32),
    }


def _forward(params, node_ids, node_mask, W, lengths, n_items):
    """node_ids (B,N), node_mask (B,N), W (B,T,N,N), lengths (B,).

    Returns (B, n_items) scores."""
    B, N = node_ids.shape
    T = W.shape[1]
    E = params["emb"].shape[1]

    safe_ids = jnp.where(node_mask, node_ids, 0)
    h = params["emb"][safe_ids] * node_mask[..., None]  # (B,N,E)

    # stacked weighted GCN over per-timestep graphs
    x = jnp.broadcast_to(h[:, None, :, :], (B, T, N, E))
    for l in range(len(params["gcn_w"])):
        msg = jnp.einsum("btnm,btme->btne", W, x)
        msg = msg @ params["gcn_w"][l] + params["gcn_b"][l]
        # BatchNorm1d over feature channels (batch stats over B*T*N valid)
        m = (node_mask[:, None, :, None] * jnp.ones((1, T, 1, 1)))
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(msg * m, axis=(0, 1, 2)) / cnt
        var = jnp.sum(((msg - mean) * m) ** 2, axis=(0, 1, 2)) / cnt
        msg = (msg - mean) / jnp.sqrt(var + BN_EPS)
        msg = msg * params["bn_scale"][l] + params["bn_offset"][l]
        x = jax.nn.relu(msg) * node_mask[:, None, :, None]

    # causal masked self-attention over the T axis, per node
    d = E // N_HEADS
    def heads(W_):
        return (x @ W_).reshape(B, T, N, N_HEADS, d)
    Q = jnp.transpose(heads(params["Wq"]), (0, 2, 3, 1, 4))  # (B,N,H,T,d)
    K = jnp.transpose(heads(params["Wk"]), (0, 2, 3, 1, 4))
    V = jnp.transpose(heads(params["Wv"]), (0, 2, 3, 1, 4))
    score = Q @ jnp.swapaxes(K, -1, -2) / np.sqrt(d)  # (B,N,H,T,T)
    causal = jnp.tril(jnp.ones((T, T), bool))
    score = jnp.where(causal[None, None, None], score, -jnp.inf)
    att = jax.nn.softmax(score, axis=-1)
    out = att @ V  # (B,N,H,T,d)
    x = jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(B, T, N, E)

    # temporal aggregation with learned weights over valid timesteps
    w_t = (x @ params["Wagg"])  # (B,T,N,1)
    t_mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None, None]
    agg = jnp.sum(w_t * x * t_mask, axis=1)  # (B,N,E)

    # global gated update against the full embedding table
    alpha = params["alpha"]  # (n_items, 1)
    beta = jnp.zeros((B, n_items)).at[
        jnp.arange(B)[:, None], safe_ids
    ].max(node_mask.astype(jnp.float32))
    embed = params["emb"][None] * (1.0 - beta[..., None] * alpha[None])
    update = alpha[safe_ids.reshape(-1)].reshape(B, N, 1) * agg
    update = update * node_mask[..., None]
    embed = embed.at[jnp.arange(B)[:, None], safe_ids].add(update)

    return (embed @ params["fc_w"] + params["fc_b"])[..., 0]  # (B, n_items)


_forward_jit = partial(jax.jit, static_argnames=("n_items",))(_forward)
"""Jitted inference entry (training wraps _forward in its own jit)."""


class DNNTSP(NextBasketRecommender):
    """Temporal-sets prediction over per-user dynamic item graphs."""

    def __init__(
        self,
        name="DNNTSP",
        emb_dim=32,
        loss_type="bpr",
        optimizer="adam",
        lr=0.001,
        weight_decay=0,
        n_epochs=100,
        batch_size=64,
        device="cpu",
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.emb_dim = emb_dim
        self.loss_type = loss_type
        self.optimizer = optimizer
        self.lr = lr
        self.weight_decay = weight_decay
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.device = device  # API parity; jax picks the device
        self.seed = seed
        if loss_type not in ("bpr", "mse", "weight_mse", "multi_label_soft_margin"):
            raise ValueError("Unknown loss_type: {}".format(loss_type))
        if optimizer not in ("adam", "sgd", "rmsprop"):
            raise ValueError("Unknown optimizer: {}".format(optimizer))
        if emb_dim % N_HEADS != 0:
            raise ValueError("emb_dim must be divisible by %d heads" % N_HEADS)

    # ------------------------------------------------------- packing
    def _pack(self, histories, N, T):
        """Histories (list of basket lists) -> dense padded graph blocks."""
        B = len(histories)
        n = self.total_items
        node_ids = np.zeros((B, N), np.int32)
        node_mask = np.zeros((B, N), bool)
        W = np.zeros((B, T, N, N), np.float32)
        lengths = np.zeros(B, np.int32)
        for b, baskets in enumerate(histories):
            baskets = [np.unique(x).tolist() for x in baskets][-T:]
            lengths[b] = len(baskets)
            nodes = sorted(set(i for bk in baskets for i in bk))[:N]
            pos = {i: p for p, i in enumerate(nodes)}
            node_ids[b, : len(nodes)] = nodes
            node_mask[b, : len(nodes)] = True
            # full-history co-occurrence weights (dnntsp.py:329-334)
            wd = {}
            for bk in baskets:
                for i in bk:
                    for j in bk:
                        if i != j and i in pos and j in pos:
                            wd[(i, j)] = wd.get((i, j), 0.0) + 1.0
            for i in nodes:
                wd.setdefault((i, i), 1.0)
            mx = max(wd.values()) if wd else 1.0
            for t, bk in enumerate(baskets):
                in_bk = set(x for x in bk if x in pos)
                for (i, j), v in wd.items():
                    if (i in in_bk and j in in_bk) or i == j:
                        W[b, t, pos[i], pos[j]] = v / mx
        return (
            jnp.asarray(node_ids), jnp.asarray(node_mask),
            jnp.asarray(W), jnp.asarray(lengths),
        )

    # ----------------------------------------------------------- fit
    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        rng = get_rng(self.seed)
        n = self.total_items
        params = _init_params(rng, n, self.emb_dim)

        histories, targets = [], []
        for _, _, [baskets] in train_set.ubi_iter(1, shuffle=False):
            if len(baskets) < 2:
                continue
            histories.append(baskets[:-1])
            targets.append(np.unique(baskets[-1]))
        if not self.trainable or not histories:
            self.params = params
            self._train_N = 1
            self._train_T = 1
            return self

        self._train_T = max(len(h) for h in histories)
        self._train_N = max(
            len(set(i for bk in h for i in bk)) for h in histories
        )
        node_ids, node_mask, W, lengths = self._pack(
            histories, self._train_N, self._train_T
        )
        y = np.zeros((len(histories), n), np.float32)
        for b, t in enumerate(targets):
            y[b, t] = 1.0
        y_d = jnp.asarray(y)

        # class weights for weight_mse (dnntsp.py:513-520)
        freq = np.bincount(train_set.uir_tuple[1], minlength=n).astype(np.float32)
        cls_w = jnp.asarray(freq / max(freq.sum(), 1.0) + 1e-6)

        B_all = len(histories)
        bsz = min(self.batch_size, B_all)
        n_total = B_all + ((-B_all) % bsz)
        n_batches = n_total // bsz
        loss_type = self.loss_type
        n_items = n

        def loss_fn(params, idx, key):
            scores = _forward(
                params, node_ids[idx], node_mask[idx], W[idx], lengths[idx],
                n_items,
            )
            yb = y_d[idx]
            if loss_type == "bpr":
                # sampled negative per positive slot (dnntsp.py:439-459)
                neg = jax.random.randint(key, yb.shape, 0, n_items)
                neg_scores = jnp.take_along_axis(scores, neg, axis=1)
                diff = scores - neg_scores
                valid = yb * (1.0 - jnp.take_along_axis(yb, neg, axis=1))
                per_user = -jnp.sum(
                    jax.nn.log_sigmoid(diff) * valid, axis=1
                ) / jnp.maximum(jnp.sum(valid, axis=1), 1.0)
                return jnp.sum(per_user)
            if loss_type == "weight_mse":
                return jnp.mean(jnp.sum(cls_w[None] * (scores - yb) ** 2, axis=1))
            if loss_type == "multi_label_soft_margin":
                return jnp.mean(
                    -(yb * jax.nn.log_sigmoid(scores)
                      + (1 - yb) * jax.nn.log_sigmoid(-scores))
                )
            return jnp.mean((scores - yb) ** 2)

        make_opt = {
            "adam": optax.adamw if self.weight_decay else optax.adam,
            "sgd": optax.sgd,
            "rmsprop": optax.rmsprop,
        }[self.optimizer]
        if self.optimizer == "adam" and self.weight_decay:
            opt = make_opt(self.lr, weight_decay=self.weight_decay)
        else:
            opt = make_opt(self.lr)
        opt_state = opt.init(params)

        # data-parallel over the mesh: params/opt/data replicated, each
        # minibatch's id vector sharded across every device so the graph
        # blocks it gathers (and the gradient psum) split along the batch
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            (params, opt_state, node_ids, node_mask, W, lengths, y_d,
             cls_w) = replicate_all(
                self.mesh, params, opt_state, node_ids, node_mask, W,
                lengths, y_d, cls_w,
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, key):
            perm = jax.random.permutation(key, n_total) % B_all

            def step(b, carry):
                params, opt_state, loss_sum = carry
                idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                if batch_shard is not None:
                    idx = jax.lax.with_sharding_constraint(idx, batch_shard)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, idx, jax.random.fold_in(key, b)
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss_sum + loss

            return jax.lax.fori_loop(
                0, n_batches, step, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        for e in range(self.n_epochs):
            params, opt_state, loss = run_epoch(
                params, opt_state, jax.random.fold_in(key, e)
            )
            if self.verbose:
                print(
                    "Epoch %d/%d, loss: %.4f"
                    % (e + 1, self.n_epochs, float(loss) / n_batches)
                )
        self.params = params
        return self

    # ------------------------------------------------------- scoring
    def score(self, user_idx, history_baskets, **kwargs):
        return self.score_baskets_batch([user_idx], [history_baskets])[0]

    def score_baskets_batch(self, user_indices, histories):
        histories = [h if len(h) else [[0]] for h in histories]
        T = max(self._train_T, max(len(h) for h in histories))
        N = max(
            self._train_N,
            max(len(set(i for bk in h for i in bk)) for h in histories),
        )
        node_ids, node_mask, W, lengths = self._pack(histories, N, T)
        from .seq_utils import pad_batch_rows

        (node_ids, node_mask, W, lengths), B = pad_batch_rows(
            [np.asarray(node_ids), np.asarray(node_mask), np.asarray(W),
             np.asarray(lengths)]
        )
        blocks = [
            jnp.asarray(node_ids), jnp.asarray(node_mask), jnp.asarray(W),
            jnp.asarray(lengths),
        ]
        if self.mesh is not None and node_ids.shape[0] % self.mesh.size == 0:
            # data-parallel inference: graph blocks sharded across the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = tuple(self.mesh.axis_names)
            blocks = [
                jax.device_put(
                    x, NamedSharding(self.mesh, P(axes, *([None] * (x.ndim - 1))))
                )
                for x in blocks
            ]
        scores = _forward_jit(self.params, *blocks, self.total_items)
        return np.asarray(scores, np.float64)[:B]

"""Beacon — correlation-sensitive next-basket recommendation
(Le, Lauw & Fang, IJCAI 2019).

Capability parity with reference ``cornac/models/beacon/recom_beacon.py:26``
+ ``beacon/beacon_tf.py`` (TF1 graph: multi-hop normalized item
co-occurrence matrix, correlation-gated basket encoder
``X·diag(relu(I_B)) + relu(X·A − |c|)``, dense→RNN sequence encoder,
and a correlation-adjusted sigmoid head with the paper's
positive-weighted loss).

TPU redesign: baskets live as padded item-id tensors; the multi-hot
expansion is a device scatter (no host sparse-tensor feed), the
basket-graph encode and the RNN (LSTM/GRU/plain, via ``lax.scan`` with
step masks) run under one jit per epoch, and the correlation matrix is a
dense device constant feeding the MXU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..utils import get_rng
from .recommender import NextBasketRecommender

EPS = 1e-8


def _init_cell(rng, in_dim, units, cell_type):
    bound = float(np.sqrt(6.0 / (in_dim + units)))
    glorot = lambda *s: jnp.asarray(
        rng.uniform(-bound, bound, size=s).astype(np.float32)
    )
    if cell_type == "LSTM":
        return {
            "wx": glorot(in_dim, 4 * units),
            "wh": glorot(units, 4 * units),
            "b": jnp.zeros((4 * units,), jnp.float32),
        }
    # GRU or basic RNN
    gates = 3 if cell_type == "GRU" else 1
    return {
        "wx": glorot(in_dim, gates * units),
        "wh": glorot(units, gates * units),
        "b": jnp.zeros((gates * units,), jnp.float32),
    }


def _rnn_scan(cell, x, lengths, units, cell_type):
    """x: (B, T, E); returns last valid hidden state (B, units)."""
    B, T, _ = x.shape

    def lstm_step(carry, inp):
        h, c, t = carry
        xt, = inp
        gates = xt @ cell["wx"] + h @ cell["wh"] + cell["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        mask = (t < lengths)[:, None]
        return (
            jnp.where(mask, h_new, h),
            jnp.where(mask, c_new, c),
            t + 1,
        ), None

    def gru_step(carry, inp):
        h, t = carry
        xt, = inp
        zr = xt @ cell["wx"][:, : 2 * h.shape[1]] + h @ cell["wh"][:, : 2 * h.shape[1]]
        z, r = jnp.split(
            jax.nn.sigmoid(zr + cell["b"][: 2 * h.shape[1]]), 2, axis=-1
        )
        n = jnp.tanh(
            xt @ cell["wx"][:, 2 * h.shape[1] :]
            + (r * h) @ cell["wh"][:, 2 * h.shape[1] :]
            + cell["b"][2 * h.shape[1] :]
        )
        h_new = (1 - z) * n + z * h
        mask = (t < lengths)[:, None]
        return (jnp.where(mask, h_new, h), t + 1), None

    def rnn_step(carry, inp):
        h, t = carry
        xt, = inp
        h_new = jnp.tanh(xt @ cell["wx"] + h @ cell["wh"] + cell["b"])
        mask = (t < lengths)[:, None]
        return (jnp.where(mask, h_new, h), t + 1), None

    xs = (jnp.swapaxes(x, 0, 1),)  # (T, B, E)
    h0 = jnp.zeros((B, units), jnp.float32)
    if cell_type == "LSTM":
        (h, _, _), _ = jax.lax.scan(lstm_step, (h0, h0, jnp.int32(0)), xs)
    elif cell_type == "GRU":
        (h, _), _ = jax.lax.scan(gru_step, (h0, jnp.int32(0)), xs)
    else:
        (h, _), _ = jax.lax.scan(rnn_step, (h0, jnp.int32(0)), xs)
    return h


class Beacon(NextBasketRecommender):
    """Correlation-sensitive basket-sequence model."""

    def __init__(
        self,
        name="Beacon",
        emb_dim=2,
        rnn_unit=4,
        alpha=0.5,
        rnn_cell_type="LSTM",
        dropout_rate=0.5,
        nb_hop=1,
        max_seq_length=None,
        n_epochs=15,
        batch_size=32,
        lr=0.001,
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.mesh = mesh
        self.emb_dim = emb_dim
        self.rnn_unit = rnn_unit
        self.alpha = alpha
        self.rnn_cell_type = rnn_cell_type
        self.dropout_rate = dropout_rate
        self.nb_hop = nb_hop
        self.max_seq_length = max_seq_length
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.lr = lr
        self.seed = seed
        if rnn_cell_type not in ("LSTM", "GRU", "RNN"):
            raise ValueError("rnn_cell_type must be LSTM, GRU, or RNN")

    # ------------------------------------------------------ statistics
    def _normalize(self, adj):
        row_sum = np.asarray(adj.sum(1)).squeeze()
        d = np.power(
            row_sum, -0.5, out=np.zeros_like(row_sum, dtype="float32"),
            where=row_sum != 0,
        )
        D = sp.diags(d)
        return adj.dot(D).transpose().dot(D).tocsr()

    def _build_correlation_matrix(self, train_set, val_set, n_items):
        """Multi-hop normalized co-occurrence (recom_beacon.py:226-263)."""
        if self.nb_hop == 0:
            return sp.csr_matrix((n_items, n_items), dtype="float32")
        from collections import Counter

        pairs = Counter()
        for ds in (train_set, val_set):
            if ds is None:
                continue
            for _, _, [baskets] in ds.ubi_iter(1, shuffle=False):
                for items in baskets:
                    cur = np.unique(items)
                    for a in range(len(cur) - 1):
                        for b in range(a + 1, len(cur)):
                            pairs[(cur[a], cur[b])] += 1
        if not pairs:
            return sp.csr_matrix((n_items, n_items), dtype="float32")
        data = list(pairs.values())
        row = [p[0] for p in pairs]
        col = [p[1] for p in pairs]
        corr = sp.csc_matrix(
            (data, (row, col)), shape=(n_items, n_items), dtype="float32"
        )
        corr = self._normalize(corr)
        w_mul, coeff = corr, 1.0
        for _ in range(1, self.nb_hop):
            coeff *= 0.85
            w_mul = w_mul * corr
            w_mul.setdiag(0.0)
            w_mul.eliminate_zeros()
            corr = corr + coeff * self._normalize(w_mul)
        return corr

    def _compute_item_probs(self, train_set, val_set, n_items):
        from collections import Counter

        freq = Counter(train_set.uir_tuple[1].tolist())
        total = len(train_set.uir_tuple[1])
        if val_set is not None:
            freq += Counter(val_set.uir_tuple[1].tolist())
            total += len(val_set.uir_tuple[1])
        probs = np.zeros(n_items, np.float32)
        for iid, cnt in freq.items():
            probs[iid] = cnt / total
        return probs

    # ------------------------------------------------------- packing
    def _pack(self, sequences):
        """List of basket sequences -> (ids (B,T,L), lengths (B,)).
        Baskets truncated to the last ``max_seq_length``; pad id =
        n_items (dropped after multi-hot scatter)."""
        T = self.max_seq_length
        L = max(
            (len(b) for seq in sequences for b in seq), default=1
        )
        L = max(L, 1)
        n = self.total_items
        ids = np.full((len(sequences), T, L), n, np.int32)
        lengths = np.zeros(len(sequences), np.int32)
        for s, seq in enumerate(sequences):
            seq = seq[-T:]
            lengths[s] = len(seq)
            for t, basket in enumerate(seq):
                basket = list(basket)[:L]
                ids[s, t, : len(basket)] = basket
        return ids, lengths

    def _multi_hot(self, ids):
        """(B, T, L) ids -> (B, T, n_items) multi-hot (device scatter)."""
        n = self.total_items
        B, T, L = ids.shape
        X = jnp.zeros((B, T, n + 1), jnp.float32)
        b_idx = jnp.arange(B)[:, None, None]
        t_idx = jnp.arange(T)[None, :, None]
        X = X.at[b_idx, t_idx, ids].max(1.0)
        return X[..., :n]

    def _forward(self, params, ids, lengths, key):
        X = self._multi_hot(ids)  # (B,T,n)
        A = self._A_dense
        IB = jax.nn.relu(params["I_B"])
        enc = X * IB[None, None, :] + jax.nn.relu(
            X @ A - jnp.abs(params["C_Basket"])
        )
        enc = jax.nn.relu(enc @ params["W_enc"] + params["b_enc"])  # (B,T,E)
        if key is not None and self.dropout_rate > 0:
            keep = 1.0 - self.dropout_rate
            enc = enc * jax.random.bernoulli(key, keep, enc.shape) / keep
        h_T = _rnn_scan(
            params["cell"], enc, lengths, self.rnn_unit, self.rnn_cell_type
        )
        probs = jax.nn.sigmoid(h_T @ params["W_H"])
        corr = probs * IB[None, :] + jax.nn.relu(probs @ A)
        logits = (1.0 - self.alpha) * probs + self.alpha * corr
        return logits

    @staticmethod
    def _loss(logits, y):
        """Positive-weighted loss (beacon_tf.py:279-297)."""
        sig = jax.nn.sigmoid(logits)
        neg_y = 1.0 - y
        pos_logits = y * logits
        pos_max = jnp.max(pos_logits, axis=1, keepdims=True)
        pos_min = jnp.min(pos_logits + neg_y * pos_max, axis=1, keepdims=True)
        nb_pos = jnp.maximum(jnp.sum(y, axis=1), 1.0)
        nb_neg = jnp.sum(neg_y, axis=1)
        pos_weight = (nb_neg / nb_pos)[:, None]
        loss = y * -jnp.log(sig + EPS) * pos_weight + neg_y * -jnp.log(
            1.0 - jax.nn.sigmoid(logits - pos_min) + EPS
        )
        return jnp.mean(loss + EPS)

    # ----------------------------------------------------------- fit
    def fit(self, train_set, val_set=None):
        super().fit(train_set=train_set, val_set=val_set)
        rng = get_rng(self.seed)
        n = self.total_items

        if self.max_seq_length is None:
            self.max_seq_length = max(
                len(b) for b in train_set.user_basket_data.values()
            )
        self.correlation_matrix = self._build_correlation_matrix(
            train_set, val_set, n
        )
        self.item_probs = self._compute_item_probs(train_set, val_set, n)
        self._A_dense = jnp.asarray(
            self.correlation_matrix.todense(), jnp.float32
        )

        he = float(np.sqrt(6.0 / n))
        params = {
            "I_B": jnp.full((n,), 1.0 / n, jnp.float32),
            "C_Basket": jnp.float32(self.correlation_matrix.mean()),
            "W_enc": jnp.asarray(
                rng.uniform(-he, he, size=(n, self.emb_dim)).astype(np.float32)
            ),
            "b_enc": jnp.zeros((self.emb_dim,), jnp.float32),
            "cell": _init_cell(rng, self.emb_dim, self.rnn_unit, self.rnn_cell_type),
            "W_H": jnp.asarray(
                rng.uniform(
                    -float(np.sqrt(6.0 / (self.rnn_unit + n))),
                    float(np.sqrt(6.0 / (self.rnn_unit + n))),
                    size=(self.rnn_unit, n),
                ).astype(np.float32)
            ),
        }
        if not self.trainable:
            self.params = params
            return self

        # training sequences: history = baskets[:-1], target = last basket
        seqs, targets = [], []
        for _, _, [baskets] in train_set.ubi_iter(1, shuffle=False):
            if len(baskets) < 2:
                continue
            seqs.append(baskets[:-1])
            targets.append(baskets[-1])
        if not seqs:
            self.params = params
            return self

        ids, lengths = self._pack(seqs)
        y = np.zeros((len(seqs), n), np.float32)
        for s, basket in enumerate(targets):
            y[s, np.asarray(basket)] = 1.0

        ids_d = jnp.asarray(ids)
        len_d = jnp.asarray(lengths)
        y_d = jnp.asarray(y)
        N = len(seqs)
        bsz = min(self.batch_size, N)
        n_total = N + ((-N) % bsz)
        n_batches = n_total // bsz

        optimizer = optax.rmsprop(self.lr)
        opt_state = optimizer.init(params)

        def loss_fn(params, idx, key):
            logits = self._forward(params, ids_d[idx], len_d[idx], key)
            return self._loss(logits, y_d[idx])

        # data-parallel over the mesh: params/opt/data replicated, each
        # minibatch's id vector sharded so the gathered sequences (and the
        # gradient psum) split along the batch dimension
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names))
            )
            params, opt_state, ids_d, len_d, y_d = replicate_all(
                self.mesh, params, opt_state, ids_d, len_d, y_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, key):
            perm = jax.random.permutation(key, n_total) % N

            def step(b, carry):
                params, opt_state, loss_sum = carry
                idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                if batch_shard is not None:
                    idx = jax.lax.with_sharding_constraint(idx, batch_shard)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, idx, jax.random.fold_in(key, b)
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
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
        from .seq_utils import pad_batch_rows

        histories = [h if len(h) else [[]] for h in histories]
        ids, lengths = self._pack(histories)
        # pad the per-batch basket width up to a multiple of 8 and the batch
        # rows to a multiple of 64 so the jitted scorer compiles O(1) shapes
        width_pad = (-ids.shape[2]) % 8
        if width_pad:
            ids = np.concatenate(
                [ids, np.full(ids.shape[:2] + (width_pad,), self.total_items,
                              np.int32)], axis=2,
            )
        (ids, lengths), B = pad_batch_rows([ids, lengths])
        if not hasattr(self, "_jit_score"):
            self._jit_score = jax.jit(
                lambda p, i, l: jax.nn.sigmoid(self._forward(p, i, l, None))
            )
            self.ignored_attrs.append("_jit_score")  # not picklable
        ids_d, len_d = jnp.asarray(ids), jnp.asarray(lengths)
        if self.mesh is not None and ids.shape[0] % self.mesh.size == 0:
            # data-parallel inference: basket sequences sharded over the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = tuple(self.mesh.axis_names)
            ids_d = jax.device_put(
                ids_d, NamedSharding(self.mesh, P(axes, None, None))
            )
            len_d = jax.device_put(len_d, NamedSharding(self.mesh, P(axes)))
        logits = self._jit_score(self.params, ids_d, len_d)
        return np.asarray(logits, np.float64)[:B]

"""GRU4Rec — session-based RNN recommendation (Hidasi et al., ICLR 2016;
Hidasi & Karatzoglou, CIKM 2018).

Capability parity with reference ``cornac/models/gru4rec/recom_gru4rec.py:38``
(torch GRU with bpr/top1/bpr-max/cross-entropy losses over session-parallel
minibatches). TPU redesign: padded fixed-length session batches (static
shapes) processed by a jax.lax.scan GRU; losses come from
:mod:`cornac_tpu.models.seq_utils` — full-softmax cross-entropy by default
(the MXU makes full softmax over the catalog cheap, removing the need for
the reference's sampled-loss machinery at these scales), with bpr-max/top1
over sampled negatives also supported.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender
from .seq_utils import bpr_max_loss, build_session_examples, pad_batch_rows, pad_histories, top1_loss

LOSSES = ("cross-entropy", "bpr-max", "top1")


def _init_gru(rng, vocab, emb_dim, hidden):
    def xav(shape):
        return jnp.asarray(xavier_uniform(shape, rng))

    return {
        "emb": jnp.asarray(
            rng.normal(0, 0.05, (vocab, emb_dim)).astype(np.float32)
        ),
        "W_z": xav((emb_dim, hidden)),
        "U_z": xav((hidden, hidden)),
        "b_z": jnp.zeros(hidden, jnp.float32),
        "W_r": xav((emb_dim, hidden)),
        "U_r": xav((hidden, hidden)),
        "b_r": jnp.zeros(hidden, jnp.float32),
        "W_h": xav((emb_dim, hidden)),
        "U_h": xav((hidden, hidden)),
        "b_h": jnp.zeros(hidden, jnp.float32),
        "out_emb": jnp.asarray(
            rng.normal(0, 0.05, (vocab, hidden)).astype(np.float32)
        ),
        "out_b": jnp.zeros(vocab, jnp.float32),
    }


@jax.jit
def _gru_last_state(params, seq, step_mask):
    """Jitted inference: final GRU state per left-padded history (the
    eager forward costs one dispatch per scan step through the runtime)."""
    return _gru_states(params, seq, step_mask)[:, -1, :]


def _gru_states(params, seq, step_mask=None):
    """(B, L, hidden) hidden states over an item-id sequence (B, L).

    ``step_mask`` (B, L) marks real steps; on masked (padding) steps the
    hidden state is carried through unchanged — needed for left-padded
    inference histories.
    """
    x = params["emb"][seq]  # (B, L, E)
    if step_mask is None:
        step_mask = jnp.ones(seq.shape, jnp.float32)

    def cell(h, inp):
        x_t, m_t = inp
        z = jax.nn.sigmoid(x_t @ params["W_z"] + h @ params["U_z"] + params["b_z"])
        r = jax.nn.sigmoid(x_t @ params["W_r"] + h @ params["U_r"] + params["b_r"])
        h_tilde = jnp.tanh(
            x_t @ params["W_h"] + (r * h) @ params["U_h"] + params["b_h"]
        )
        h_new = (1 - z) * h + z * h_tilde
        h_new = m_t[:, None] * h_new + (1 - m_t[:, None]) * h
        return h_new, h_new

    h0 = jnp.zeros((seq.shape[0], params["U_z"].shape[0]), jnp.float32)
    _, states = jax.lax.scan(
        cell, h0, (jnp.swapaxes(x, 0, 1), jnp.swapaxes(step_mask, 0, 1))
    )
    return jnp.swapaxes(states, 0, 1)  # (B, L, H)


class GRU4Rec(NextItemRecommender):
    """GRU session model trained on padded session batches."""

    def __init__(
        self,
        name="GRU4Rec",
        layers=None,
        loss="cross-entropy",
        batch_size=64,
        learning_rate=0.05,
        n_epochs=10,
        n_sample=128,
        bpreg=1.0,
        max_len=50,
        trainable=True,
        verbose=False,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.layers = [100] if layers is None else list(layers)
        self.loss = loss
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.n_epochs = n_epochs
        self.n_sample = n_sample
        self.bpreg = bpreg
        self.max_len = max_len
        self.seed = seed
        self.rng = get_rng(seed)

        if loss not in LOSSES:
            raise ValueError(f"loss must be one of {LOSSES}")

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        hidden = self.layers[0]
        vocab = self.num_items
        if not hasattr(self, "params"):
            self.params = _init_gru(self.rng, vocab, hidden, hidden)

        users, inputs, targets, mask = build_session_examples(
            train_set, self.max_len
        )
        n = len(users)
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz
        if n_pad:
            inputs = np.concatenate([inputs, np.zeros((n_pad, self.max_len), np.int32)])
            targets = np.concatenate(
                [targets, np.zeros((n_pad, self.max_len), np.int32)]
            )
            mask = np.concatenate([mask, np.zeros((n_pad, self.max_len), np.float32)])
        n_batches = inputs.shape[0] // bsz

        optimizer = optax.adagrad(self.learning_rate)
        opt_state = optimizer.init(self.params)

        loss_kind = self.loss
        n_sample = self.n_sample
        bpreg = self.bpreg

        def loss_fn(params, seq, tgt, m, key):
            states = _gru_states(params, seq)  # (B, L, H)
            if loss_kind == "cross-entropy":
                logits = states @ params["out_emb"].T + params["out_b"]
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1).squeeze(-1)
                return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

            negs = jax.random.randint(key, (n_sample,), 0, vocab)
            pos_vec = params["out_emb"][tgt]  # (B, L, H)
            pos_scores = jnp.sum(states * pos_vec, axis=-1) + params["out_b"][tgt]
            neg_scores = states @ params["out_emb"][negs].T + params["out_b"][negs]
            neg_mask = (negs[None, None, :] != tgt[..., None]).astype(jnp.float32)
            if loss_kind == "bpr-max":
                per_pos = bpr_max_loss(pos_scores, neg_scores, neg_mask, bpreg)
            else:
                per_pos = top1_loss(pos_scores, neg_scores, neg_mask)
            return jnp.sum(per_pos * m) / jnp.maximum(jnp.sum(m), 1.0)

        inputs_d = jnp.asarray(inputs)
        targets_d = jnp.asarray(targets)
        mask_d = jnp.asarray(mask)

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                order = jax.random.permutation(ekey, inputs_d.shape[0])

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    idx = jax.lax.dynamic_slice(order, (b * bsz,), (bsz,))
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params,
                        inputs_d[idx],
                        targets_d[idx],
                        mask_d[idx],
                        jax.random.fold_in(ekey, b),
                    )
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, loss_sum + loss

                return jax.lax.fori_loop(
                    0, n_batches, step, (params, opt_state, jnp.float32(0.0))
                )

            return jax.lax.fori_loop(
                0, n_epochs, epoch, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(self.rng.randint(2**31))
        chunk = 1 if self.verbose else self.n_epochs
        done = 0
        while done < self.n_epochs:
            e = min(chunk, self.n_epochs - done)
            self.params, opt_state, loss_sum = run_epochs(
                self.params, opt_state, jax.random.fold_in(key, done), e
            )
            done += e
            if self.verbose:
                print(
                    "Epoch %d/%d, loss: %.4f"
                    % (done, self.n_epochs, float(loss_sum) / n_batches)
                )
        return self

    def _history_states(self, histories):
        padded, lengths = pad_histories(histories, self.max_len)
        step_mask = (
            np.arange(self.max_len)[None, :] >= (self.max_len - lengths)[:, None]
        ).astype(np.float32)
        (padded, step_mask), B = pad_batch_rows([padded, step_mask])
        states = _gru_last_state(
            self.params, jnp.asarray(padded), jnp.asarray(step_mask)
        )
        return states[:B]  # last state (histories are left-padded)

    def score(self, user_idx, history_items, **kwargs):
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        h = self._history_states(histories)
        logits = h @ self.params["out_emb"].T + self.params["out_b"]
        return np.asarray(logits, dtype=np.float64)[:, : self.num_items]

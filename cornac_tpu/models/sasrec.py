"""SASRec — Self-Attentive Sequential Recommendation (Kang & McAuley,
ICDM 2018).

Capability parity with reference ``cornac/models/sasrec/recom_sasrec.py:36``
(torch transformer). TPU design: causal multi-head self-attention blocks in
pure JAX over padded fixed-length sessions (static shapes; sessions are
short so dense attention is the right call — SURVEY §5 long-context note),
shared input/output item embedding, BCE over (positive, sampled negative)
per position as in the paper, optax Adam, multi-epoch fused fit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender
from .seq_utils import build_session_examples, pad_histories, pad_batch_rows


def _init_sasrec(rng, vocab, d, n_layers, max_len):
    def xav(shape):
        return jnp.asarray(xavier_uniform(shape, rng))

    blocks = []
    for _ in range(n_layers):
        blocks.append(
            {
                "Wq": xav((d, d)),
                "Wk": xav((d, d)),
                "Wv": xav((d, d)),
                "Wo": xav((d, d)),
                "ln1_g": jnp.ones(d, jnp.float32),
                "ln1_b": jnp.zeros(d, jnp.float32),
                "ff1": xav((d, d)),
                "ff1_b": jnp.zeros(d, jnp.float32),
                "ff2": xav((d, d)),
                "ff2_b": jnp.zeros(d, jnp.float32),
                "ln2_g": jnp.ones(d, jnp.float32),
                "ln2_b": jnp.zeros(d, jnp.float32),
            }
        )
    return {
        # + 1 row: index `vocab` is the padding id
        "emb": jnp.asarray(
            rng.normal(0, 0.02, (vocab + 1, d)).astype(np.float32)
        ),
        "pos": jnp.asarray(rng.normal(0, 0.02, (max_len, d)).astype(np.float32)),
        "blocks": blocks,
        "ln_f_g": jnp.ones(d, jnp.float32),
        "ln_f_b": jnp.zeros(d, jnp.float32),
    }


def _layernorm(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-8) * g + b


@partial(jax.jit, static_argnames=("pad_id", "n_heads", "n_items"))
def _sasrec_scores(params, seq, pad_id, n_heads, n_items):
    """Jitted inference: next-item logits for left-padded histories. The
    eager (unjitted) forward costs one dispatch per op through the runtime;
    fusing the whole scorer is a >20x eval-latency win (PERF.md)."""
    states = _sasrec_states(params, seq, pad_id, n_heads)
    last = states[:, -1, :]  # left-padded: last column is most recent
    return last @ params["emb"][:n_items].T


def _sasrec_states(params, seq, pad_id, n_heads):
    """(B, L, d) causal-transformer states; padded positions attend nowhere
    and are zeroed."""
    B, L = seq.shape
    d = params["pos"].shape[1]
    key_mask = seq != pad_id  # (B, L)

    h = params["emb"][seq] * np.sqrt(d) + params["pos"][None, :, :]
    h = h * key_mask[:, :, None]

    causal = jnp.tril(jnp.ones((L, L), bool))
    attn_mask = causal[None, :, :] & key_mask[:, None, :]  # (B, L, L)

    head_dim = d // n_heads
    for blk in params["blocks"]:
        q = _layernorm(h, blk["ln1_g"], blk["ln1_b"])
        Q = (q @ blk["Wq"]).reshape(B, L, n_heads, head_dim)
        K = (h @ blk["Wk"]).reshape(B, L, n_heads, head_dim)
        V = (h @ blk["Wv"]).reshape(B, L, n_heads, head_dim)
        logits = jnp.einsum("blhd,bmhd->bhlm", Q, K) / np.sqrt(head_dim)
        logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhlm,bmhd->blhd", attn, V).reshape(B, L, d)
        h = h + ctx @ blk["Wo"]

        f = _layernorm(h, blk["ln2_g"], blk["ln2_b"])
        f = jax.nn.relu(f @ blk["ff1"] + blk["ff1_b"])
        h = h + f @ blk["ff2"] + blk["ff2_b"]
        h = h * key_mask[:, :, None]

    return _layernorm(h, params["ln_f_g"], params["ln_f_b"])


class SASRec(NextItemRecommender):
    """Causal-attention next-item model on padded session batches."""

    def __init__(
        self,
        name="SASRec",
        embedding_dim=64,
        n_layers=2,
        n_heads=1,
        max_len=50,
        n_epochs=10,
        batch_size=128,
        learning_rate=0.001,
        l2_reg=0.0,
        trainable=True,
        verbose=False,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        self.embedding_dim = embedding_dim
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.max_len = max_len
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.l2_reg = l2_reg
        self.seed = seed
        self.rng = get_rng(seed)
        assert embedding_dim % n_heads == 0

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        vocab = self.num_items
        pad_id = vocab
        if not hasattr(self, "params"):
            self.params = _init_sasrec(
                self.rng, vocab, self.embedding_dim, self.n_layers, self.max_len
            )

        users, inputs, targets, mask = build_session_examples(train_set, self.max_len)
        # left-pad (canonical SASRec layout; matches inference positions)
        lengths = mask.sum(axis=1).astype(int)
        L = self.max_len
        li = np.full_like(inputs, pad_id)
        lt = np.zeros_like(targets)
        lm = np.zeros_like(mask)
        for b, ln in enumerate(lengths):
            if ln > 0:
                li[b, L - ln :] = inputs[b, :ln]
                lt[b, L - ln :] = targets[b, :ln]
                lm[b, L - ln :] = 1.0
        inputs, targets, mask = li.astype(np.int32), lt, lm

        n = inputs.shape[0]
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz
        if n_pad:
            inputs = np.concatenate(
                [inputs, np.full((n_pad, self.max_len), pad_id, np.int32)]
            )
            targets = np.concatenate(
                [targets, np.zeros((n_pad, self.max_len), np.int32)]
            )
            mask = np.concatenate([mask, np.zeros((n_pad, self.max_len), np.float32)])
        n_batches = inputs.shape[0] // bsz

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)
        n_heads = self.n_heads
        l2 = self.l2_reg

        def loss_fn(params, seq, tgt, m, key):
            states = _sasrec_states(params, seq, pad_id, n_heads)
            pos_vec = params["emb"][tgt]
            negs = jax.random.randint(key, tgt.shape, 0, vocab)
            neg_vec = params["emb"][negs]
            pos_logit = jnp.sum(states * pos_vec, axis=-1)
            neg_logit = jnp.sum(states * neg_vec, axis=-1)
            # paper's BCE on positive/negative logits per position
            loss = -jnp.log(jax.nn.sigmoid(pos_logit) + 1e-24) - jnp.log(
                1 - jax.nn.sigmoid(neg_logit) + 1e-24
            )
            loss = jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
            if l2 > 0:
                loss = loss + l2 * (
                    jnp.sum(params["emb"] ** 2) + jnp.sum(params["pos"] ** 2)
                )
            return loss

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

    def score(self, user_idx, history_items, **kwargs):
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        pad_id = self.num_items
        padded, lengths = pad_histories(histories, self.max_len, pad_value=pad_id)
        (padded,), B = pad_batch_rows([padded])
        logits = _sasrec_scores(
            self.params, jnp.asarray(padded), pad_id, self.n_heads, self.num_items
        )
        return np.asarray(logits, dtype=np.float64)[:B]

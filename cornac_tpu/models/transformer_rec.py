"""TransformerRec + BERT4Rec — transformer-based next-item recommendation.

Capability parity with reference
``cornac/models/transformer_rec/recom_transformer_rec.py:40`` (HuggingFace
bert/gpt2/xlnet/electra backbones; mlm/clm/plm/rtd objectives) and
``cornac/models/bert4rec/recom_bert4rec.py:19`` (alias = bert + mlm).
TPU design: in-house transformer encoder blocks (shared with SASRec's
attention machinery style) over padded sessions with static shapes:

- backbone 'bert' : bidirectional attention; 'gpt2': causal attention.
- objective 'mlm': masked-item prediction (BERT4Rec); 'clm': next-item
  cross-entropy at every position; 'plm' is served by 'mlm' with a warning
  (two-stream permutation attention is out of scope), 'rtd' raises.

Inference appends a mask token ('mlm') or uses the last position ('clm')
and scores all items with the shared item embedding.
"""

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender
from .sasrec import _layernorm
from .seq_utils import build_session_examples, pad_batch_rows, pad_histories

BACKBONES = ("bert", "gpt2")
OBJECTIVES = ("mlm", "clm", "plm", "rtd")


def _init_transformer(rng, vocab_with_special, d, n_layers, max_len, ffn_mult=4):
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
                "ff1": xav((d, ffn_mult * d)),
                "ff1_b": jnp.zeros(ffn_mult * d, jnp.float32),
                "ff2": xav((ffn_mult * d, d)),
                "ff2_b": jnp.zeros(d, jnp.float32),
                "ln2_g": jnp.ones(d, jnp.float32),
                "ln2_b": jnp.zeros(d, jnp.float32),
            }
        )
    return {
        "emb": jnp.asarray(
            rng.normal(0, 0.02, (vocab_with_special, d)).astype(np.float32)
        ),
        "pos": jnp.asarray(rng.normal(0, 0.02, (max_len, d)).astype(np.float32)),
        "blocks": blocks,
        "ln_f_g": jnp.ones(d, jnp.float32),
        "ln_f_b": jnp.zeros(d, jnp.float32),
        "out_b": jnp.zeros(vocab_with_special, jnp.float32),
    }


@partial(jax.jit, static_argnames=("pad_id", "n_heads", "causal", "n_items"))
def _encode_scores(params, seq, pad_id, n_heads, causal, n_items):
    """Jitted inference: next-item logits from the last contextual state."""
    states = _encode(params, seq, pad_id, n_heads, causal)
    last = states[:, -1, :]
    return last @ params["emb"][:n_items].T + params["out_b"][:n_items]


def _encode(params, seq, pad_id, n_heads, causal):
    B, L = seq.shape
    d = params["pos"].shape[1]
    key_mask = seq != pad_id

    h = params["emb"][seq] + params["pos"][None, :, :]
    h = h * key_mask[:, :, None]

    if causal:
        struct = jnp.tril(jnp.ones((L, L), bool))[None]
    else:
        struct = jnp.ones((1, L, L), bool)
    attn_mask = struct & key_mask[:, None, :]

    head_dim = d // n_heads
    for blk in params["blocks"]:
        q = _layernorm(h, blk["ln1_g"], blk["ln1_b"])
        Q = (q @ blk["Wq"]).reshape(B, L, n_heads, head_dim)
        K = (q @ blk["Wk"]).reshape(B, L, n_heads, head_dim)
        V = (q @ blk["Wv"]).reshape(B, L, n_heads, head_dim)
        logits = jnp.einsum("blhd,bmhd->bhlm", Q, K) / np.sqrt(head_dim)
        logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhlm,bmhd->blhd", attn, V).reshape(B, L, d)
        h = h + ctx @ blk["Wo"]

        f = _layernorm(h, blk["ln2_g"], blk["ln2_b"])
        f = jax.nn.gelu(f @ blk["ff1"] + blk["ff1_b"])
        h = h + f @ blk["ff2"] + blk["ff2_b"]
        h = h * key_mask[:, :, None]

    return _layernorm(h, params["ln_f_g"], params["ln_f_b"])


class TransformerRec(NextItemRecommender):
    """Configurable transformer next-item model."""

    def __init__(
        self,
        name="TransformerRec",
        backbone="bert",
        objective="mlm",
        embedding_dim=64,
        n_layers=2,
        n_heads=2,
        max_len=50,
        mask_prob=0.2,
        n_epochs=10,
        batch_size=128,
        learning_rate=0.001,
        trainable=True,
        verbose=False,
        seed=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        if backbone in ("xlnet", "electra"):
            warnings.warn(
                f"backbone '{backbone}' is served by the in-house 'bert' "
                "encoder (HuggingFace backbones are not bundled)."
            )
            backbone = "bert"
        if backbone not in BACKBONES:
            raise ValueError(f"backbone must be one of {BACKBONES}")
        if objective not in OBJECTIVES:
            raise ValueError(f"objective must be one of {OBJECTIVES}")
        if objective == "rtd":
            raise NotImplementedError(
                "replaced-token detection requires a generator/discriminator "
                "pair and is not implemented on this backend"
            )
        if objective == "plm":
            warnings.warn(
                "objective 'plm' is served by 'mlm' (two-stream permutation "
                "attention is out of scope)."
            )
            objective = "mlm"
        if objective == "clm" and backbone == "bert":
            backbone = "gpt2"  # causal objective needs causal attention

        self.backbone = backbone
        self.objective = objective
        self.embedding_dim = embedding_dim
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.max_len = max_len
        self.mask_prob = mask_prob
        self.n_epochs = n_epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.seed = seed
        self.rng = get_rng(seed)
        assert embedding_dim % n_heads == 0

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        vocab = self.num_items
        self.pad_id = vocab
        self.mask_id = vocab + 1
        if not hasattr(self, "params"):
            self.params = _init_transformer(
                self.rng, vocab + 2, self.embedding_dim, self.n_layers, self.max_len
            )

        users, inputs, targets, mask = build_session_examples(train_set, self.max_len)
        if self.objective == "mlm":
            # BERT4Rec trains on full sessions (first input + all targets)
            sessions = np.full_like(inputs, self.pad_id)
            sess_mask = np.zeros_like(mask)
            for b in range(inputs.shape[0]):
                ln = int(mask[b].sum())
                seq = [inputs[b, 0]] + list(targets[b, :ln])
                seq = seq[-self.max_len :]
                sessions[b, : len(seq)] = seq
                sess_mask[b, : len(seq)] = 1.0
            inputs, mask = sessions, sess_mask
        else:
            inputs = np.where(mask > 0, inputs, self.pad_id)

        n = inputs.shape[0]
        bsz = min(self.batch_size, n)
        n_pad = (-n) % bsz
        if n_pad:
            inputs = np.concatenate(
                [inputs, np.full((n_pad, self.max_len), self.pad_id, np.int32)]
            )
            targets = np.concatenate(
                [targets, np.zeros((n_pad, self.max_len), np.int32)]
            )
            mask = np.concatenate([mask, np.zeros((n_pad, self.max_len), np.float32)])
        n_batches = inputs.shape[0] // bsz

        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(self.params)
        pad_id, mask_id = self.pad_id, self.mask_id
        n_heads = self.n_heads
        causal = self.backbone == "gpt2"
        objective = self.objective
        mask_prob = self.mask_prob

        def loss_fn(params, seq, tgt, m, key):
            if objective == "mlm":
                mask_draw = jax.random.uniform(key, seq.shape)
                is_masked = (mask_draw < mask_prob) & (m > 0)
                model_in = jnp.where(is_masked, mask_id, seq)
                states = _encode(params, model_in, pad_id, n_heads, causal)
                labels = seq
                sel = is_masked
            else:  # clm: predict the next item at every position
                states = _encode(params, seq, pad_id, n_heads, causal)
                labels = tgt
                sel = m > 0
            logits = states @ params["emb"].T + params["out_b"]
            logp = jax.nn.log_softmax(logits[..., : pad_id], axis=-1)
            safe_labels = jnp.clip(labels, 0, pad_id - 1)
            nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1).squeeze(-1)
            self32 = sel.astype(jnp.float32)
            return jnp.sum(nll * self32) / jnp.maximum(jnp.sum(self32), 1.0)

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
        if self.objective == "mlm":
            # append the mask token; its contextual state scores next items
            padded, lengths = pad_histories(
                [list(h) + [self.mask_id] for h in histories],
                self.max_len,
                pad_value=self.pad_id,
            )
        else:
            padded, lengths = pad_histories(
                histories, self.max_len, pad_value=self.pad_id
            )
        (padded,), B = pad_batch_rows([padded])
        logits = _encode_scores(
            self.params, jnp.asarray(padded), self.pad_id, self.n_heads,
            self.backbone == "gpt2", self.num_items,
        )
        return np.asarray(logits, dtype=np.float64)[:B]


class BERT4Rec(TransformerRec):
    """BERT4Rec (Sun et al., CIKM 2019) = bert backbone + mlm objective
    (reference ``recom_bert4rec.py:19``)."""

    def __init__(
        self,
        name="BERT4Rec",
        embedding_dim=64,
        n_layers=2,
        n_heads=2,
        max_len=50,
        mask_prob=0.2,
        n_epochs=10,
        batch_size=128,
        learning_rate=0.001,
        trainable=True,
        verbose=False,
        seed=None,
    ):
        super().__init__(
            name=name,
            backbone="bert",
            objective="mlm",
            embedding_dim=embedding_dim,
            n_layers=n_layers,
            n_heads=n_heads,
            max_len=max_len,
            mask_prob=mask_prob,
            n_epochs=n_epochs,
            batch_size=batch_size,
            learning_rate=learning_rate,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
        )

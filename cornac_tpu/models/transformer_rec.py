"""TransformerRec + BERT4Rec — transformer-based next-item recommendation.

Capability parity with reference
``cornac/models/transformer_rec/recom_transformer_rec.py:183`` (HuggingFace
bert/gpt2/xlnet/electra backbones; mlm/clm/plm/rtd objectives in
``transformer_rec/objectives/``; the ``seq_utils/losses.py`` loss family
over in-batch + sampled negatives; best-on-val selection) and
``cornac/models/bert4rec/recom_bert4rec.py:19`` (alias = bert + mlm).
TPU design: in-house transformer encoder blocks over padded sessions with
static shapes:

- backbone 'bert'/'electra' : bidirectional attention; 'gpt2': causal;
  'xlnet': bidirectional with the two-stream permutation pass used by the
  'plm' objective.
- objective 'mlm': masked-item prediction (Cloze, always-mask — no
  80/10/10, matching ``objectives/mlm.py``); 'clm': next-item prediction at
  ``loss_at`` positions ('all' or 'last'); 'rtd': tied-generator ELECTRA
  (``objectives/rtd.py``) — MLM pass + self-sampled corruption + per-
  position original-vs-replaced head, ``total = mlm + rtd_lambda * disc``;
  'plm': permutation LM (``objectives/plm.py``) — random factorization
  order per row, two-stream attention, targets predicted by the query
  stream.
- Losses come from :func:`cornac_tpu.models.seq_utils.batch_loss`: per
  selected position the score row is [in-batch targets at the same step |
  shared sampled negatives] — the reference's flattened (M, M+N) diagonal
  contract restricted to same-step columns (static shapes; same
  distribution of negatives).

Inference appends a mask token (mlm/plm/rtd) or uses the last position
(clm) and scores all items with the shared item embedding.
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
from ..engine.nn import (
    block_attention as _block_attention,
    block_ffn as _block_ffn,
    init_transformer_block,
    layer_norm as _layernorm,
    make_drop as _make_drop,
)
from .seq_utils import (
    SUPPORTED_LOSSES,
    batch_loss,
    build_session_examples,
    neg_sampling_table,
    pad_batch_rows,
    pad_histories,
    sample_negatives,
    val_score,
)

BACKBONES = ("bert", "gpt2", "xlnet", "electra")
OBJECTIVES = ("mlm", "clm", "plm", "rtd")
VALID_LOSS_AT = ("all", "last")


def _init_transformer(
    rng, vocab_with_special, d, n_layers, max_len, ffn_mult=4, rtd=False, plm=False
):
    def xav(shape):
        return jnp.asarray(xavier_uniform(shape, rng))

    blocks = [
        init_transformer_block(xav, d, ffn_mult=ffn_mult) for _ in range(n_layers)
    ]
    params = {
        "emb": jnp.asarray(
            rng.normal(0, 0.02, (vocab_with_special, d)).astype(np.float32)
        ),
        "pos": jnp.asarray(rng.normal(0, 0.02, (max_len, d)).astype(np.float32)),
        "blocks": blocks,
        "ln_f_g": jnp.ones(d, jnp.float32),
        "ln_f_b": jnp.zeros(d, jnp.float32),
        "out_b": jnp.zeros(vocab_with_special, jnp.float32),
    }
    if rtd:
        # original-vs-replaced discriminator head (objectives/rtd.py build())
        params["disc_w"] = xav((d, 1))
        params["disc_b"] = jnp.zeros(1, jnp.float32)
    if plm:
        # learned query-stream embedding (XLNet's g-stream seed vector)
        params["g_query"] = jnp.asarray(
            rng.normal(0, 0.02, (1, 1, d)).astype(np.float32)
        )
    return params


@partial(jax.jit, static_argnames=("pad_id", "n_heads", "causal", "n_items"))
def _encode_scores(params, seq, pad_id, n_heads, causal, n_items):
    """Jitted inference: next-item logits from the last contextual state."""
    states = _encode(params, seq, pad_id, n_heads, causal)
    last = states[:, -1, :]
    return last @ params["emb"][:n_items].T + params["out_b"][:n_items]


# attention / ffn / dropout sub-layers are the shared engine blocks
# (engine/nn.py); imported under their historical private names above


def _encode(params, seq, pad_id, n_heads, causal, dropout=0.0, drop_key=None):
    B, L = seq.shape
    key_mask = seq != pad_id
    drop = _make_drop(dropout, drop_key)

    h = params["emb"][seq] + params["pos"][None, :, :]
    h = h * key_mask[:, :, None]
    h = drop(h, 0)

    if causal:
        struct = jnp.tril(jnp.ones((L, L), bool))[None]
    else:
        struct = jnp.ones((1, L, L), bool)
    attn_mask = struct & key_mask[:, None, :]

    for bi, blk in enumerate(params["blocks"]):
        q = _layernorm(h, blk["ln1_g"], blk["ln1_b"])
        h = h + _block_attention(blk, q, q, attn_mask, n_heads, drop, 2 * bi + 1)
        h = h + _block_ffn(blk, h, drop, 2 * bi + 2)
        h = h * key_mask[:, :, None]

    return _layernorm(h, params["ln_f_g"], params["ln_f_b"])


def _encode_two_stream(
    params, seq, pad_id, n_heads, perm_mask, target_mask, dropout=0.0, drop_key=None
):
    """XLNet-style two-stream pass (objectives/plm.py semantics).

    ``perm_mask`` (B, L, L) bool: True where query q MAY attend key k for
    the content stream; the query (g) stream uses the same mask minus self-
    attention at target positions (handled by perm_mask construction:
    ``perm_index[q] <= perm_index[k]`` forbids self since equal indices).
    ``target_mask`` (B, L): positions predicted by the g stream. Returns the
    g-stream states (B, L, D) — rows are meaningful only at target
    positions.
    """
    key_mask = seq != pad_id
    drop = _make_drop(dropout, drop_key)

    h = params["emb"][seq] + params["pos"][None, :, :]
    h = h * key_mask[:, :, None]
    h = drop(h, 0)
    # g stream starts from the learned query vector + position
    g = jnp.broadcast_to(params["g_query"], h.shape) + params["pos"][None, :, :]

    eye = jnp.eye(seq.shape[1], dtype=bool)[None]
    content_mask = (perm_mask | eye) & key_mask[:, None, :]  # content sees self
    query_mask = perm_mask & key_mask[:, None, :]  # g never sees self

    for bi, blk in enumerate(params["blocks"]):
        hq = _layernorm(h, blk["ln1_g"], blk["ln1_b"])
        gq = _layernorm(g, blk["ln1_g"], blk["ln1_b"])
        h_new = h + _block_attention(
            blk, hq, hq, content_mask, n_heads, drop, 4 * bi + 1
        )
        g_new = g + _block_attention(
            blk, gq, hq, query_mask, n_heads, drop, 4 * bi + 2
        )
        h = h_new + _block_ffn(blk, h_new, drop, 4 * bi + 3)
        g = g_new + _block_ffn(blk, g_new, drop, 4 * bi + 4)
        h = h * key_mask[:, :, None]
        g = g * key_mask[:, :, None]

    return _layernorm(g, params["ln_f_g"], params["ln_f_b"])


def _bernoulli_mask(key, valid, p):
    """Masked-position draw with the reference safeguards
    (objectives/base.py bernoulli_mask): at least one masked and, where
    possible, at least one visible non-pad position per row."""
    u = jax.random.uniform(key, valid.shape)
    masked = (u < p) & valid
    # at least one masked: mask the highest-u valid position if none drawn
    none_masked = ~jnp.any(masked, axis=1)
    fallback = jnp.argmax(jnp.where(valid, u, -1.0), axis=1)
    masked = masked | (
        none_masked[:, None]
        & (jnp.arange(valid.shape[1])[None, :] == fallback[:, None])
        & valid
    )
    # at least one visible: unmask the lowest-u valid position if all masked
    n_valid = jnp.sum(valid, axis=1)
    all_masked = jnp.sum(masked, axis=1) >= jnp.maximum(n_valid, 1)
    keep = jnp.argmin(jnp.where(valid, u, 2.0), axis=1)
    unmask = (
        all_masked[:, None]
        & (jnp.arange(valid.shape[1])[None, :] == keep[:, None])
        & (n_valid > 1)[:, None]
    )
    return masked & ~unmask


class TransformerRec(NextItemRecommender):
    """Configurable transformer next-item model.

    Parameters mirror the reference (``recom_transformer_rec.py:183-213``):
    ``backbone`` (bert/gpt2/xlnet/electra), ``objective`` (mlm/clm/plm/rtd),
    ``loss_at`` ('all'/'last', clm only), ``loss`` (the seq_utils family),
    ``n_sample``/``sample_alpha``, ``num_blocks``/``num_heads``/``dropout``,
    ``l2_reg``, ``bpreg``/``elu_param``, ``mask_prob``, ``rtd_lambda``,
    ``device`` (no-op), ``model_selection`` 'last'/'best' with
    ``val_eval_every``/``val_k``/``val_metric``. ``n_layers``/``n_heads``
    stay as aliases of ``num_blocks``/``num_heads``.
    """

    def __init__(
        self,
        name="TransformerRec",
        backbone="bert",
        objective="mlm",
        loss_at="all",
        embedding_dim=100,
        loss="ce",
        batch_size=512,
        learning_rate=0.001,
        n_sample=2048,
        sample_alpha=0.5,
        n_epochs=10,
        max_len=50,
        num_blocks=2,
        num_heads=1,
        dropout=0.2,
        l2_reg=0.0,
        bpreg=1.0,
        elu_param=0.5,
        mask_prob=0.2,
        rtd_lambda=1.0,
        device="cpu",
        model_selection="last",
        val_eval_every=5,
        val_k=20,
        val_metric="recall",
        n_layers=None,
        n_heads=None,
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name=name, trainable=trainable, verbose=verbose)
        if backbone not in BACKBONES:
            raise ValueError(f"backbone must be one of {BACKBONES}")
        if objective not in OBJECTIVES:
            raise ValueError(f"objective must be one of {OBJECTIVES}")
        if loss_at not in VALID_LOSS_AT:
            raise ValueError(f"loss_at must be one of {VALID_LOSS_AT}")
        if loss not in SUPPORTED_LOSSES:
            raise ValueError(
                f"loss='{loss}' not supported; choose from {SUPPORTED_LOSSES}"
            )
        if model_selection not in ("last", "best"):
            raise ValueError(
                f"model_selection='{model_selection}' not supported; "
                "choose 'last' or 'best'"
            )
        if objective == "clm" and backbone != "gpt2":
            backbone = "gpt2"  # causal objective needs causal attention
        if objective in ("mlm", "plm", "rtd") and backbone == "gpt2":
            raise ValueError(f"objective '{objective}' needs a bidirectional backbone")

        self.backbone = backbone
        self.objective = objective
        self.loss_at = loss_at
        self.embedding_dim = embedding_dim
        self.loss = loss
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.n_sample = n_sample
        self.sample_alpha = sample_alpha
        self.n_epochs = n_epochs
        self.max_len = max_len
        self.num_blocks = num_blocks if n_layers is None else n_layers
        self.num_heads = num_heads if n_heads is None else n_heads
        self.dropout = dropout
        self.l2_reg = l2_reg
        self.bpreg = bpreg
        self.elu_param = elu_param
        self.mask_prob = mask_prob
        self.rtd_lambda = rtd_lambda
        self.device = device  # no-op: XLA owns placement on TPU
        self.model_selection = model_selection
        self.val_eval_every = val_eval_every
        self.val_k = val_k
        self.val_metric = val_metric
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)
        assert embedding_dim % self.num_heads == 0

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        vocab = self.num_items
        self.pad_id = vocab
        self.mask_id = vocab + 1
        if not hasattr(self, "params"):
            self.params = _init_transformer(
                self.rng,
                vocab + 2,
                self.embedding_dim,
                self.num_blocks,
                self.max_len,
                rtd=self.objective == "rtd",
                plm=self.objective == "plm",
            )

        users, inputs, targets, mask = build_session_examples(train_set, self.max_len)
        if self.objective in ("mlm", "plm", "rtd"):
            # Cloze-style objectives train on full sessions
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
            if self.loss_at == "last":
                # only the final transition of each session contributes
                last_pos = np.maximum(mask.sum(axis=1).astype(int) - 1, 0)
                only_last = np.zeros_like(mask)
                only_last[np.arange(mask.shape[0]), last_pos] = mask[
                    np.arange(mask.shape[0]), last_pos
                ]
                mask = only_last

        n = inputs.shape[0]
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            # the per-step minibatch shards across the data axis
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
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
        n_heads = self.num_heads
        causal = self.backbone == "gpt2"
        objective = self.objective
        mask_prob = self.mask_prob
        loss_kind = self.loss
        n_sample = self.n_sample
        dropout = float(self.dropout)
        l2 = self.l2_reg
        bpreg, elu_param = self.bpreg, self.elu_param
        rtd_lambda = self.rtd_lambda
        L = self.max_len

        cum_probs = neg_sampling_table(train_set, self.sample_alpha, vocab)

        def position_loss(params, states, labels, sel, key):
            """Shared loss family over selected positions (in-batch columns
            at the same step + shared sampled negatives)."""
            negs = sample_negatives(key, cum_probs, (n_sample,))
            return batch_loss(
                loss_kind,
                states,
                params["emb"],
                params["out_b"],
                labels,
                sel.astype(jnp.float32),
                negs,
                bpreg=bpreg,
                elu_param=elu_param,
            )

        def loss_fn(params, seq, tgt, m, key):
            k_mask, k_neg, k_drop, k_corrupt = jax.random.split(key, 4)
            valid = (m > 0) & (seq != pad_id)
            if objective == "clm":
                states = _encode(
                    params, seq, pad_id, n_heads, causal,
                    dropout=dropout, drop_key=k_drop,
                )
                loss = position_loss(params, states, tgt, m > 0, k_neg)
            elif objective in ("mlm", "rtd"):
                is_masked = _bernoulli_mask(k_mask, valid, mask_prob)
                model_in = jnp.where(is_masked, mask_id, seq)
                states = _encode(
                    params, model_in, pad_id, n_heads, causal,
                    dropout=dropout, drop_key=k_drop,
                )
                loss = position_loss(params, states, seq, is_masked, k_neg)
                if objective == "rtd":
                    # (3) corrupt masked positions with self-sampled items
                    logits_items = jax.lax.stop_gradient(
                        states @ params["emb"][:vocab].T + params["out_b"][:vocab]
                    )
                    sampled = jax.random.categorical(k_corrupt, logits_items)
                    corrupted = jnp.where(is_masked, sampled, seq)
                    # (4) discriminator: original vs replaced per position
                    disc_states = _encode(
                        params, corrupted, pad_id, n_heads, causal,
                        dropout=dropout, drop_key=jax.random.fold_in(k_drop, 999),
                    )
                    disc_logits = (disc_states @ params["disc_w"]).squeeze(-1) + params["disc_b"]
                    disc_labels = (corrupted != seq).astype(jnp.float32)
                    bce = (
                        jnp.maximum(disc_logits, 0)
                        - disc_logits * disc_labels
                        + jnp.log1p(jnp.exp(-jnp.abs(disc_logits)))
                    )
                    vf = valid.astype(jnp.float32)
                    disc_loss = jnp.sum(bce * vf) / jnp.maximum(jnp.sum(vf), 1.0)
                    loss = loss + rtd_lambda * disc_loss
            else:  # plm
                is_target = _bernoulli_mask(k_mask, valid, mask_prob)
                # random factorization order; non-targets pinned to -1 so
                # every query may attend them (objectives/plm.py recipe)
                order = jax.random.uniform(k_corrupt, seq.shape)
                rank = jnp.argsort(jnp.argsort(order, axis=1), axis=1)
                perm_index = jnp.where(is_target, rank, -1)
                perm_mask = (
                    perm_index[:, :, None] <= perm_index[:, None, :]
                ) & is_target[:, None, :]
                # q may attend k iff NOT (perm-forbidden): reference stores
                # the mask as "forbidden" implicitly; here True = allowed
                perm_allowed = ~perm_mask
                g = _encode_two_stream(
                    params, seq, pad_id, n_heads, perm_allowed, is_target,
                    dropout=dropout, drop_key=k_drop,
                )
                loss = position_loss(params, g, seq, is_target, k_neg)

            if l2 > 0:
                loss = loss + l2 * (
                    jnp.sum(params["emb"] ** 2) + jnp.sum(params["pos"] ** 2)
                )
            return loss

        inputs_d = jnp.asarray(inputs)
        targets_d = jnp.asarray(targets)
        mask_d = jnp.asarray(mask)

        # data-parallel over the mesh (same treatment as SASRec): params
        # and optimizer state replicated, each step's minibatch sharded
        # across every device; GSPMD psums the gradients — identical math
        # to the single-device program
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            self.params, opt_state, inputs_d, targets_d, mask_d = (
                replicate_all(
                    self.mesh, self.params, opt_state, inputs_d, targets_d,
                    mask_d,
                )
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs):
            def epoch(e, carry):
                params, opt_state, _ = carry
                ekey = jax.random.fold_in(key, e)
                order = jax.random.permutation(ekey, inputs_d.shape[0])

                def step(b, carry):
                    params, opt_state, loss_sum = carry
                    idx = jax.lax.dynamic_slice(order, (b * bsz,), (bsz,))
                    seq, tgt, m = inputs_d[idx], targets_d[idx], mask_d[idx]
                    if batch_shard is not None:
                        seq, tgt, m = (
                            jax.lax.with_sharding_constraint(x, batch_shard)
                            for x in (seq, tgt, m)
                        )
                    loss, grads = jax.value_and_grad(loss_fn)(
                        params,
                        seq,
                        tgt,
                        m,
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
        select_best = self.model_selection == "best" and val_set is not None
        chunk = (
            self.val_eval_every
            if select_best
            else (1 if self.verbose else self.n_epochs)
        )
        best_score, best_params = -np.inf, None
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
            if select_best:
                score = val_score(
                    self, train_set, val_set, self.val_metric, self.val_k
                )
                if self.verbose:
                    print(
                        "  val %s@%d = %.4f" % (self.val_metric, self.val_k, score)
                    )
                if score > best_score:
                    best_score = score
                    best_params = jax.tree_util.tree_map(np.asarray, self.params)
        if select_best and best_params is not None:
            self.params = jax.tree_util.tree_map(jnp.asarray, best_params)
        return self

    def score(self, user_idx, history_items, **kwargs):
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        if self.objective in ("mlm", "plm", "rtd"):
            # append the mask token; its contextual state scores next items
            # (mask-append serving, objectives/{mlm,plm,rtd}.py)
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
        seq_d = jnp.asarray(padded)
        if self.mesh is not None and padded.shape[0] % self.mesh.size == 0:
            # data-parallel inference: histories sharded across the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            seq_d = jax.device_put(
                seq_d,
                NamedSharding(
                    self.mesh, P(tuple(self.mesh.axis_names), None)
                ),
            )
        logits = _encode_scores(
            self.params, seq_d, self.pad_id, self.num_heads,
            self.backbone == "gpt2", self.num_items,
        )
        return np.asarray(logits, dtype=np.float64)[:B]


class BERT4Rec(TransformerRec):
    """BERT4Rec (Sun et al., CIKM 2019) = bert backbone + mlm objective
    (reference ``recom_bert4rec.py:19``)."""

    def __init__(
        self,
        name="BERT4Rec",
        embedding_dim=100,
        loss="ce",
        batch_size=512,
        learning_rate=0.001,
        n_sample=2048,
        sample_alpha=0.5,
        n_epochs=10,
        max_len=50,
        num_blocks=2,
        num_heads=1,
        dropout=0.2,
        l2_reg=0.0,
        bpreg=1.0,
        elu_param=0.5,
        mask_prob=0.2,
        device="cpu",
        model_selection="last",
        val_eval_every=5,
        val_k=20,
        val_metric="recall",
        n_layers=None,
        n_heads=None,
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(
            name=name,
            backbone="bert",
            objective="mlm",
            embedding_dim=embedding_dim,
            loss=loss,
            batch_size=batch_size,
            learning_rate=learning_rate,
            n_sample=n_sample,
            sample_alpha=sample_alpha,
            n_epochs=n_epochs,
            max_len=max_len,
            num_blocks=num_blocks,
            num_heads=num_heads,
            dropout=dropout,
            l2_reg=l2_reg,
            bpreg=bpreg,
            elu_param=elu_param,
            mask_prob=mask_prob,
            device=device,
            model_selection=model_selection,
            val_eval_every=val_eval_every,
            val_k=val_k,
            val_metric=val_metric,
            n_layers=n_layers,
            n_heads=n_heads,
            trainable=trainable,
            verbose=verbose,
            seed=seed,
            mesh=mesh,
        )

"""TIGER — Recommender Systems with Generative Retrieval
(Rajput et al., NeurIPS 2023).

Capability parity with reference ``cornac/models/tiger/recom_tiger.py:32`` +
``tiger/tiger.py`` (torch + HuggingFace T5Stack): (1) an RQ-VAE (or
residual k-means) quantizes item content embeddings into hierarchical
semantic IDs with a collision-disambiguation level; (2) a T5-style
encoder-decoder generates the next item's semantic ID from the session
history's tokens; scoring via constrained beam search over the prefix trie
or exact teacher-forced likelihood of every item.

TPU redesign: the RQ-VAE trains as one compiled program per epoch
(straight-through residual quantization is ~three matmuls per level on the
MXU; k-means++ init and dead-code restarts stay host-side — they are
once-per-epoch O(K·D) bookkeeping); the seq2seq is an in-house pre-LN
encoder-decoder with learned positions (deviation: the reference's T5
relative position bias is replaced by learned absolute positions — the
sequences are short and fixed-length) sharing one offset token table, with
whole-epoch jit.  Beam search walks ≤ num_levels+1 steps with trie masks
per level; 'exact' scoring is a batched teacher-forced pass over item
chunks.
"""

from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender

SUPPORTED_SCORING = ("beam", "exact")
SUPPORTED_TOKENIZERS = ("rqvae", "rkmeans")
SUPPORTED_LR_SCHEDULES = ("constant", "cosine")


# --------------------------------------------------------------- tokenizers
def _kmeans_np(x, k, rng, n_iters=10):
    """k-means++ seeding + Lloyd iterations (host numpy)."""
    n = x.shape[0]
    if n < k:
        idx = rng.randint(0, n, size=k)
        return x[idx] + 1e-4 * rng.randn(k, x.shape[1]).astype(x.dtype)
    centroids = np.empty((k, x.shape[1]), x.dtype)
    centroids[0] = x[rng.randint(n)]
    d2 = ((x - centroids[0]) ** 2).sum(1)
    for i in range(1, k):
        p = d2 + 1e-12
        centroids[i] = x[rng.choice(n, p=p / p.sum())]
        d2 = np.minimum(d2, ((x - centroids[i]) ** 2).sum(1))
    for _ in range(n_iters):
        d = ((x[:, None, :] - centroids[None]) ** 2).sum(-1)
        ids = d.argmin(1)
        for c in range(k):
            m = ids == c
            if m.any():
                centroids[c] = x[m].mean(0)
            else:
                centroids[c] = x[rng.randint(n)]
    return centroids


def _mlp_params(rng, sizes):
    out = []
    for i in range(len(sizes) - 1):
        out.append({
            "w": jnp.asarray(xavier_uniform((sizes[i], sizes[i + 1]), rng)),
            "b": jnp.zeros((sizes[i + 1],), jnp.float32),
        })
    return out


def _mlp_apply(layers, x):
    for i, l in enumerate(layers):
        x = x @ l["w"] + l["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _rq_quantize(codebooks, z, beta):
    """Residual quantization with VQ losses. Returns (ids (B,L), q, loss)."""
    ids, q = [], jnp.zeros_like(z)
    loss = 0.0
    r = z
    for level in range(codebooks.shape[0]):
        cb = codebooks[level]
        d = (
            jnp.sum(r**2, axis=1, keepdims=True)
            - 2 * r @ cb.T
            + jnp.sum(cb**2, axis=1)[None]
        )
        lid = jnp.argmin(d, axis=1)
        e = cb[lid]
        loss = loss + jnp.mean((e - jax.lax.stop_gradient(r)) ** 2) + beta * jnp.mean(
            (r - jax.lax.stop_gradient(e)) ** 2
        )
        ids.append(lid)
        q = q + e
        r = r - jax.lax.stop_gradient(e)
    return jnp.stack(ids, axis=1), q, loss


def _rqvae_loss(params, x, beta):
    z = _mlp_apply(params["enc"], x)
    ids, q, loss_rq = _rq_quantize(params["codebooks"], z, beta)
    z_q = z + jax.lax.stop_gradient(q - z)
    x_hat = _mlp_apply(params["dec"], z_q)
    return jnp.mean((x_hat - x) ** 2) + loss_rq, ids


# ------------------------------------------------------------- seq2seq
def _init_blocks(rng, d, n_layers, ffn, cross, n_heads, d_kv):
    """T5-style: head projections are (d, n_heads*d_kv), decoupled from d."""
    xav = lambda s: jnp.asarray(xavier_uniform(s, rng))
    a = n_heads * d_kv
    blocks = []
    for _ in range(n_layers):
        blk = {
            "Wq": xav((d, a)), "Wk": xav((d, a)), "Wv": xav((d, a)),
            "Wo": xav((a, d)),
            "ln1_g": jnp.ones(d, jnp.float32), "ln1_b": jnp.zeros(d, jnp.float32),
            "ff1": xav((d, ffn)), "ff1_b": jnp.zeros(ffn, jnp.float32),
            "ff2": xav((ffn, d)), "ff2_b": jnp.zeros(d, jnp.float32),
            "ln2_g": jnp.ones(d, jnp.float32), "ln2_b": jnp.zeros(d, jnp.float32),
        }
        if cross:
            blk.update({
                "Cq": xav((d, a)), "Ck": xav((d, a)), "Cv": xav((d, a)),
                "Co": xav((a, d)),
                "lnc_g": jnp.ones(d, jnp.float32),
                "lnc_b": jnp.zeros(d, jnp.float32),
            })
        blocks.append(blk)
    return blocks


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-6) * g + b


def _mha(q_in, kv_in, Wq, Wk, Wv, Wo, mask, n_heads):
    B, Lq, _ = q_in.shape
    Lk = kv_in.shape[1]
    hd = Wq.shape[1] // n_heads
    Q = (q_in @ Wq).reshape(B, Lq, n_heads, hd)
    K = (kv_in @ Wk).reshape(B, Lk, n_heads, hd)
    V = (kv_in @ Wv).reshape(B, Lk, n_heads, hd)
    logits = jnp.einsum("blhd,bmhd->bhlm", Q, K) / np.sqrt(hd)
    logits = jnp.where(mask[:, None, :, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", attn, V).reshape(B, Lq, n_heads * hd) @ Wo


def _encoder(params, tokens, n_heads):
    """tokens: (B, S) offset ids, 0 = pad. Returns (enc_out, key_mask)."""
    key_mask = tokens != 0
    h = params["tok_emb"][tokens] + params["enc_pos"][None, : tokens.shape[1]]
    h = h * key_mask[:, :, None]
    mask = jnp.ones((1, tokens.shape[1], 1), bool) & key_mask[:, None, :]
    for blk in params["enc_blocks"]:
        q = _ln(h, blk["ln1_g"], blk["ln1_b"])
        h = h + _mha(q, q, blk["Wq"], blk["Wk"], blk["Wv"], blk["Wo"], mask, n_heads)
        f = _ln(h, blk["ln2_g"], blk["ln2_b"])
        h = h + jax.nn.relu(f @ blk["ff1"] + blk["ff1_b"]) @ blk["ff2"] + blk["ff2_b"]
        h = h * key_mask[:, :, None]
    return _ln(h, params["enc_lnf_g"], params["enc_lnf_b"]), key_mask


def _decoder(params, dec_emb, enc_out, enc_mask, n_heads):
    """dec_emb: (B, t, d) BOS + token embeddings. Returns hidden (B, t, d)."""
    B, t, d = dec_emb.shape
    h = dec_emb + params["dec_pos"][None, :t]
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    cross = jnp.ones((1, t, 1), bool) & enc_mask[:, None, :]
    for blk in params["dec_blocks"]:
        q = _ln(h, blk["ln1_g"], blk["ln1_b"])
        h = h + _mha(q, q, blk["Wq"], blk["Wk"], blk["Wv"], blk["Wo"], causal, n_heads)
        c = _ln(h, blk["lnc_g"], blk["lnc_b"])
        h = h + _mha(
            c, enc_out, blk["Cq"], blk["Ck"], blk["Cv"], blk["Co"], cross, n_heads
        )
        f = _ln(h, blk["ln2_g"], blk["ln2_b"])
        h = h + jax.nn.relu(f @ blk["ff1"] + blk["ff1_b"]) @ blk["ff2"] + blk["ff2_b"]
    return _ln(h, params["dec_lnf_g"], params["dec_lnf_b"])


_encoder_jit = partial(jax.jit, static_argnames=("n_heads",))(_encoder)
"""Jitted inference encoder (training wraps _encoder in its own jit)."""


@partial(jax.jit, static_argnames=("n_heads", "n_levels"))
def _exact_cross_scores(params, offsets, targets, enc_out, enc_mask, n_heads, n_levels):
    """(B, nb) sequence log-probs of nb target sids for B encoded histories:
    the (user, target) cross product flattens into one decoder batch — the
    previous eager per-chunk loop paid one dispatch per op."""
    B = enc_out.shape[0]
    nb, L = targets.shape
    d = params["dec_pos"].shape[-1]
    emb = params["tok_emb"][targets[:, :-1] + offsets[None, : L - 1]]
    dec = jnp.concatenate(
        [jnp.broadcast_to(params["bos"], (nb, 1, d)), emb], axis=1
    )
    dec_t = jnp.broadcast_to(dec[None], (B, nb, L, d)).reshape(B * nb, L, d)
    eo = jnp.repeat(enc_out, nb, axis=0)
    em = jnp.repeat(enc_mask, nb, axis=0)
    h = _decoder(params, dec_t, eo, em, n_heads)
    tgt = jnp.broadcast_to(targets[None], (B, nb, L)).reshape(B * nb, L)
    scores = jnp.zeros((B * nb,), h.dtype)
    for level in range(n_levels):
        logp = jax.nn.log_softmax(h[:, level] @ params["heads"][level], axis=-1)
        scores = scores + jnp.take_along_axis(
            logp, tgt[:, level : level + 1], axis=1
        )[:, 0]
    return scores.reshape(B, nb)


@partial(jax.jit, static_argnames=("n_heads", "level"))
def _beam_level_logp(params, offsets, prefix, enc_out, enc_mask, n_heads, level):
    """(R, level_size) next-token log-probs for R (history, beam-prefix)
    rows; one jitted decoder call per beam level."""
    R = prefix.shape[0]
    d = params["dec_pos"].shape[-1]
    bos = jnp.broadcast_to(params["bos"], (R, 1, d))
    if level == 0:
        dec = bos
    else:
        emb = params["tok_emb"][prefix + offsets[None, :level]]
        dec = jnp.concatenate([bos, emb], axis=1)
    h = _decoder(params, dec, enc_out, enc_mask, n_heads)
    return jax.nn.log_softmax(h[:, -1] @ params["heads"][level], axis=-1)


class TIGER(NextItemRecommender):
    """Generative retrieval with hierarchical semantic IDs."""

    def __init__(
        self,
        name="TIGER",
        tokenizer="rqvae",
        feature_standardize=False,
        rqvae_latent_dim=32,
        rqvae_hidden_dims=(512, 256, 128),
        rqvae_num_levels=3,
        rqvae_codebook_size=256,
        rqvae_beta=0.25,
        rqvae_n_epochs=200,
        rqvae_learning_rate=0.001,
        rqvae_batch_size=1024,
        rqvae_weight_decay=0.0,
        d_model=128,
        d_ff=1024,
        num_heads=6,
        d_kv=64,
        num_enc_layers=4,
        num_dec_layers=4,
        dropout=0.1,
        max_len=20,
        n_epochs=20,
        learning_rate=0.001,
        weight_decay=0.0001,
        batch_size=256,
        lr_schedule="constant",
        warmup_steps=10000,
        model_selection="last",
        val_metric="ndcg",
        val_eval_every=5,
        val_k=10,
        val_sample=2000,
        scoring="beam",
        n_beams=20,
        scoring_batch_size=2048,
        device="auto",
        trainable=True,
        verbose=False,
        seed=None,
        mesh=None,
    ):
        super().__init__(name, trainable=trainable, verbose=verbose)
        if scoring not in SUPPORTED_SCORING:
            raise ValueError(
                "scoring='%s' not supported; choose from %s"
                % (scoring, SUPPORTED_SCORING)
            )
        if tokenizer not in SUPPORTED_TOKENIZERS:
            raise ValueError(
                "tokenizer='%s' not supported; choose from %s"
                % (tokenizer, SUPPORTED_TOKENIZERS)
            )
        if lr_schedule not in SUPPORTED_LR_SCHEDULES:
            raise ValueError(
                "lr_schedule='%s' not supported; choose from %s"
                % (lr_schedule, SUPPORTED_LR_SCHEDULES)
            )
        if model_selection not in ("last", "best"):
            raise ValueError("model_selection must be 'last' or 'best'")
        self.tokenizer = tokenizer
        self.feature_standardize = feature_standardize
        self.rqvae_latent_dim = rqvae_latent_dim
        self.rqvae_hidden_dims = tuple(rqvae_hidden_dims)
        self.rqvae_num_levels = rqvae_num_levels
        self.rqvae_codebook_size = rqvae_codebook_size
        self.rqvae_beta = rqvae_beta
        self.rqvae_n_epochs = rqvae_n_epochs
        self.rqvae_learning_rate = rqvae_learning_rate
        self.rqvae_batch_size = rqvae_batch_size
        self.rqvae_weight_decay = rqvae_weight_decay
        self.d_model = d_model
        self.d_ff = d_ff
        self.num_heads = num_heads
        self.d_kv = d_kv
        self.num_enc_layers = num_enc_layers
        self.num_dec_layers = num_dec_layers
        self.dropout = dropout
        self.max_len = max_len
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.batch_size = batch_size
        self.lr_schedule = lr_schedule
        self.warmup_steps = warmup_steps
        self.model_selection = model_selection
        self.val_metric = val_metric
        self.val_eval_every = val_eval_every
        self.val_k = val_k
        self.val_sample = val_sample
        self.scoring = scoring
        self.n_beams = n_beams
        self.scoring_batch_size = scoring_batch_size
        self.device = device  # API parity; jax picks the device
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

    # ------------------------------------------------------- features
    def _get_item_features(self):
        item_feature = getattr(self.train_set, "item_feature", None)
        features = getattr(item_feature, "features", None)
        if features is None:
            raise ValueError(
                "TIGER requires precomputed item content embeddings. Provide "
                "them via NextItemEvaluation.from_splits(..., item_feature="
                "FeatureModality(features=..., ids=...))."
            )
        if features.shape[0] < self.total_items:
            raise ValueError(
                "item_feature has %d rows but %d items are known; every item "
                "needs a feature vector." % (features.shape[0], self.total_items)
            )
        return np.asarray(features[: self.total_items], dtype="float32")

    # ------------------------------------------------------ tokenizer
    def _fit_rqvae(self, feats):
        rng = self.rng
        L, K, D = self.rqvae_num_levels, self.rqvae_codebook_size, self.rqvae_latent_dim
        sizes = [feats.shape[1], *self.rqvae_hidden_dims, D]
        params = {
            "enc": _mlp_params(rng, sizes),
            "dec": _mlp_params(rng, sizes[::-1]),
            "codebooks": jnp.asarray(
                rng.randn(L, K, D).astype(np.float32) * 0.01
            ),
        }
        feats_d = jnp.asarray(feats)

        # k-means init on encoder residuals, level by level
        z = np.asarray(_mlp_apply(params["enc"], feats_d))
        cbs = []
        r = z
        for _ in range(L):
            c = _kmeans_np(r, K, rng)
            cbs.append(c)
            ids = ((r[:, None, :] - c[None]) ** 2).sum(-1).argmin(1)
            r = r - c[ids]
        params["codebooks"] = jnp.asarray(np.stack(cbs).astype(np.float32))

        opt = optax.adamw(self.rqvae_learning_rate,
                          weight_decay=self.rqvae_weight_decay)
        opt_state = opt.init(params)
        n = feats.shape[0]
        bsz = min(self.rqvae_batch_size, n)
        n_total = n + ((-n) % bsz)
        n_batches = n_total // bsz
        beta = self.rqvae_beta

        def loss_fn(params, x):
            (loss, ids) = _rqvae_loss(params, x, beta)
            return loss, ids

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, key):
            perm = jax.random.permutation(key, n_total) % n

            def step(b, carry):
                params, opt_state, used, loss_sum = carry
                idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                (loss, ids), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, feats_d[idx]
                )
                used = used.at[jnp.arange(L)[:, None], ids.T].set(True)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, used, loss_sum + loss

            used0 = jnp.zeros((L, K), bool)
            return jax.lax.fori_loop(
                0, n_batches, step, (params, opt_state, used0, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(rng.randint(2**31))
        for e in range(self.rqvae_n_epochs):
            params, opt_state, used, loss = run_epoch(
                params, opt_state, jax.random.fold_in(key, e)
            )
            # dead-code restart (host): unused codes -> random residuals
            used_np = np.asarray(used)
            if not used_np.all():
                z = np.asarray(_mlp_apply(params["enc"], feats_d))
                cbs = np.asarray(params["codebooks"]).copy()
                r = z
                for level in range(L):
                    dead = ~used_np[level]
                    if dead.any():
                        idx = rng.randint(0, len(r), size=int(dead.sum()))
                        cbs[level][dead] = r[idx]
                    ids = (
                        ((r[:, None, :] - cbs[level][None]) ** 2).sum(-1).argmin(1)
                    )
                    r = r - cbs[level][ids]
                params["codebooks"] = jnp.asarray(cbs)
                opt_state = opt.init(params)  # moments reset on restart
            if self.verbose:
                print("RQ-VAE epoch %d/%d loss %.4f"
                      % (e + 1, self.rqvae_n_epochs, float(loss) / n_batches))

        self.rqvae_params = params
        z = _mlp_apply(params["enc"], feats_d)
        ids, _, _ = _rq_quantize(params["codebooks"], z, beta)
        return np.asarray(ids, np.int64)

    def _fit_rkmeans(self, feats):
        self.rkmeans_centroids = []
        codes = []
        r = feats.copy()
        for _ in range(self.rqvae_num_levels):
            c = _kmeans_np(r, self.rqvae_codebook_size, self.rng)
            ids = ((r[:, None, :] - c[None]) ** 2).sum(-1).argmin(1)
            r = r - c[ids]
            self.rkmeans_centroids.append(c)
            codes.append(ids)
        return np.stack(codes, axis=1).astype(np.int64)

    def _build_semantic_ids(self, codes):
        counters = defaultdict(int)
        dedup = np.zeros(len(codes), dtype=np.int64)
        for i, row in enumerate(map(tuple, codes)):
            dedup[i] = counters[row]
            counters[row] += 1
        self.sid_table = np.concatenate([codes, dedup[:, None]], axis=1)
        self.level_sizes = [self.rqvae_codebook_size] * self.rqvae_num_levels + [
            int(dedup.max()) + 1
        ]
        children = [defaultdict(set) for _ in self.level_sizes]
        self.sid_to_item = {}
        for i, row in enumerate(self.sid_table):
            sid = tuple(int(v) for v in row)
            for level in range(len(sid)):
                children[level][sid[:level]].add(sid[level])
            self.sid_to_item[sid] = i
        self.prefix_children = [
            {p: np.fromiter(sorted(t), dtype=np.int64) for p, t in lc.items()}
            for lc in children
        ]

    # -------------------------------------------------------- seq2seq
    def _init_seq2seq(self):
        rng = self.rng
        d = self.d_model
        n_levels = len(self.level_sizes)
        vocab = 1 + sum(self.level_sizes)
        S = self.max_len * n_levels
        self.offsets = np.concatenate(
            ([1], 1 + np.cumsum(self.level_sizes[:-1]))
        ).astype(np.int64)
        self.pad_idx = self.total_items
        self.enc_token_table = np.zeros(
            (self.total_items + 1, n_levels), dtype=np.int64
        )
        self.enc_token_table[: self.total_items] = self.sid_table + self.offsets
        return {
            "tok_emb": jnp.asarray(
                rng.normal(0, 0.02, (vocab, d)).astype(np.float32)
            ).at[0].set(0.0),
            "enc_pos": jnp.asarray(rng.normal(0, 0.02, (S, d)).astype(np.float32)),
            "dec_pos": jnp.asarray(
                rng.normal(0, 0.02, (n_levels + 1, d)).astype(np.float32)
            ),
            "bos": jnp.asarray(rng.normal(0, 0.02, (1, 1, d)).astype(np.float32)),
            "enc_blocks": _init_blocks(rng, d, self.num_enc_layers, self.d_ff, False, self.num_heads, self.d_kv),
            "dec_blocks": _init_blocks(rng, d, self.num_dec_layers, self.d_ff, True, self.num_heads, self.d_kv),
            "enc_lnf_g": jnp.ones(d, jnp.float32),
            "enc_lnf_b": jnp.zeros(d, jnp.float32),
            "dec_lnf_g": jnp.ones(d, jnp.float32),
            "dec_lnf_b": jnp.zeros(d, jnp.float32),
            "heads": [
                jnp.asarray(xavier_uniform((d, s), rng)) for s in self.level_sizes
            ],
        }

    def _dec_emb(self, params, target_prefix):
        """BOS + embedded (un-offset) target prefix tokens."""
        B = target_prefix.shape[0]
        bos = jnp.broadcast_to(params["bos"], (B, 1, self.d_model))
        if target_prefix.shape[1] == 0:
            return bos
        offs = jnp.asarray(self.offsets[: target_prefix.shape[1]])
        emb = params["tok_emb"][target_prefix + offs[None]]
        return jnp.concatenate([bos, emb], axis=1)

    def _seq2seq_loss(self, params, enc_tokens, target):
        enc_out, enc_mask = _encoder(params, enc_tokens, self.num_heads)
        h = _decoder(
            params, self._dec_emb(params, target[:, :-1]), enc_out, enc_mask,
            self.num_heads,
        )
        loss = 0.0
        for level in range(len(self.level_sizes)):
            logits = h[:, level] @ params["heads"][level]
            loss = loss + jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, target[:, level]
                )
            )
        return loss

    def _build_examples(self, train_set):
        item_arr = train_set.uir_tuple[1]
        hists, outs = [], []
        for sid, idx_list in train_set.sessions.items():
            items = [int(item_arr[i]) for i in idx_list]
            for t in range(1, len(items)):
                h = items[:t][-self.max_len :]
                hists.append([self.pad_idx] * (self.max_len - len(h)) + h)
                outs.append(items[t])
        if not hists:
            raise ValueError("No session with at least 2 items to train on.")
        return np.asarray(hists, np.int64), np.asarray(outs, np.int64)

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        feats = self._get_item_features()
        if self.feature_standardize:
            mean, std = feats.mean(0), feats.std(0)
            std[std == 0] = 1.0
            feats = ((feats - mean) / std).astype("float32")

        codes = (
            self._fit_rkmeans(feats)
            if self.tokenizer == "rkmeans"
            else self._fit_rqvae(feats)
        )
        self._build_semantic_ids(codes)
        params = self._init_seq2seq()

        hists, outs = self._build_examples(train_set)
        enc_tokens = self.enc_token_table[hists].reshape(len(hists), -1)
        enc_d = jnp.asarray(enc_tokens)
        tgt_d = jnp.asarray(self.sid_table[outs])

        n = len(hists)
        bsz = min(self.batch_size, n)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_total = n + ((-n) % bsz)
        n_batches = n_total // bsz
        total_steps = max(1, n_batches * self.n_epochs)

        if self.lr_schedule == "cosine":
            sched = optax.warmup_cosine_decay_schedule(
                0.0, self.learning_rate, min(self.warmup_steps, total_steps),
                total_steps,
            )
        else:
            sched = self.learning_rate
        opt = optax.adamw(sched, weight_decay=self.weight_decay)
        opt_state = opt.init(params)

        # data-parallel over the mesh (seq2seq phase — the dominant cost;
        # the RQ-VAE tokenizer trains over n_items rows and stays
        # single-program): params/opt replicated, minibatches sharded,
        # GSPMD psums the gradients
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            params, opt_state, enc_d, tgt_d = replicate_all(
                self.mesh, params, opt_state, enc_d, tgt_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, key):
            perm = jax.random.permutation(key, n_total) % n

            def step(b, carry):
                params, opt_state, loss_sum = carry
                idx = jax.lax.dynamic_slice(perm, (b * bsz,), (bsz,))
                eb, tb = enc_d[idx], tgt_d[idx]
                if batch_shard is not None:
                    eb = jax.lax.with_sharding_constraint(eb, batch_shard)
                    tb = jax.lax.with_sharding_constraint(tb, batch_shard)
                loss, grads = jax.value_and_grad(self._seq2seq_loss)(
                    params, eb, tb
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss_sum + loss

            return jax.lax.fori_loop(
                0, n_batches, step, (params, opt_state, jnp.float32(0.0))
            )

        key = jax.random.PRNGKey(self.rng.randint(2**31))
        select_best = self.model_selection == "best" and val_set is not None
        best_score, best_params = -np.inf, None
        for e in range(self.n_epochs):
            params, opt_state, loss = run_epoch(
                params, opt_state, jax.random.fold_in(key, e)
            )
            if self.verbose:
                print("TIGER epoch %d/%d loss %.4f"
                      % (e + 1, self.n_epochs, float(loss) / n_batches))
            if select_best and (e + 1) % self.val_eval_every == 0:
                self.params = params
                score = self._validate(val_set)
                if score > best_score:
                    best_score = score
                    best_params = jax.tree_util.tree_map(jnp.copy, params)
        self.params = (
            best_params if (select_best and best_params is not None) else params
        )
        return self

    # ------------------------------------------------------ validation
    def _validate(self, val_set):
        from ..metrics import AUC, MRR, NDCG, Recall

        name = self.val_metric.lower()
        metric = {
            "recall": lambda: Recall(k=self.val_k),
            "ndcg": lambda: NDCG(k=self.val_k),
            "auc": AUC,
            "mrr": MRR,
        }.get(name)
        if metric is None:
            raise ValueError("val_metric='%s' not supported" % self.val_metric)
        metric = metric()

        item_arr = val_set.uir_tuple[1]
        sessions = []
        for sid, idx_list in val_set.sessions.items():
            items = [int(item_arr[i]) for i in idx_list]
            if len(items) >= 2:
                sessions.append(items)
        if self.val_sample is not None and len(sessions) > self.val_sample:
            idx = self.rng.choice(len(sessions), size=self.val_sample, replace=False)
            sessions = [sessions[i] for i in sorted(idx)]

        num_items = self.train_set.num_items
        item_indices = np.arange(num_items)
        orig_beams, self.n_beams = self.n_beams, max(self.n_beams, self.val_k)
        results = []
        sessions = [it for it in sessions if it[-1] < num_items]
        chunk = 128
        for start in range(0, len(sessions), chunk):
            batch = sessions[start : start + chunk]
            rows = self.score_history_batch(
                [None] * len(batch), [it[:-1] for it in batch]
            )[:, :num_items]
            for scores, items in zip(rows, batch):
                target = items[-1]
                rank = np.argsort(-scores)
                results.append(
                    metric.compute(
                        gt_pos=np.array([target]),
                        gt_neg=np.delete(item_indices, target),
                        pd_rank=rank,
                        pd_scores=scores,
                        item_indices=item_indices,
                    )
                )
        self.n_beams = orig_beams
        return float(np.mean(results)) if results else 0.0

    # --------------------------------------------------------- scoring
    def _encode_history_batch(self, histories):
        hists = []
        for h in histories:
            h = list(h)[-self.max_len :]
            hists.append([self.pad_idx] * (self.max_len - len(h)) + h)
        enc_tokens = self.enc_token_table[np.asarray(hists, np.int64)].reshape(
            len(hists), -1
        )
        return _encoder_jit(
            self.params, jnp.asarray(enc_tokens), n_heads=self.num_heads
        )

    def score(self, user_idx, history_items, **kwargs):
        if len(history_items) == 0:
            return np.ones(self.total_items, dtype="float")
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        empty = [b for b, h in enumerate(histories) if len(h) == 0]
        safe = [list(h) if len(h) else [0] for h in histories]
        enc_out, enc_mask = self._encode_history_batch(safe)
        if self.scoring == "beam":
            out = self._score_beam_batch(enc_out, enc_mask)
        else:
            out = self._score_exact_batch(enc_out, enc_mask)
        for b in empty:
            out[b] = 1.0
        return out

    def _score_beam_batch(self, enc_out, enc_mask):
        """Per-user beam search over the semantic-id trie; each level is one
        jitted decoder call over all (user, beam) rows, trie masking and
        beam pruning stay on host."""
        B = int(enc_out.shape[0])
        offsets_d = jnp.asarray(self.offsets)
        beams = [[()] for _ in range(B)]
        beam_lp = [np.zeros(1) for _ in range(B)]
        for level, size in enumerate(self.level_sizes):
            counts = [len(bs) for bs in beams]
            R = max(counts)
            prefix = np.zeros((B, R, level), np.int64)
            for b, bs in enumerate(beams):
                for r in range(R):
                    prefix[b, r, :] = bs[min(r, counts[b] - 1)]
            eo = jnp.repeat(enc_out, R, axis=0)
            em = jnp.repeat(enc_mask, R, axis=0)
            logp = np.asarray(
                _beam_level_logp(
                    self.params, offsets_d,
                    jnp.asarray(prefix.reshape(B * R, level)),
                    eo, em, self.num_heads, level,
                )
            ).reshape(B, R, size)
            new_beams, new_lp = [], []
            for b in range(B):
                allowed = np.full((counts[b], size), -np.inf)
                for i, beam in enumerate(beams[b]):
                    allowed[i, self.prefix_children[level][beam]] = 0.0
                total = (
                    beam_lp[b][:, None] + logp[b, : counts[b]] + allowed
                ).ravel()
                k = min(self.n_beams, int(np.isfinite(total).sum()))
                top = np.argpartition(-total, k - 1)[:k]
                top = top[np.argsort(-total[top])]
                new_beams.append(
                    [beams[b][j // size] + (int(j % size),) for j in top]
                )
                new_lp.append(total[top])
            beams, beam_lp = new_beams, new_lp
        out = np.full((B, self.total_items), -1e10, dtype="float")
        for b in range(B):
            for sid, lp in zip(beams[b], beam_lp[b]):
                out[b, self.sid_to_item[sid]] = lp
        return out

    def _score_exact_batch(self, enc_out, enc_mask):
        """(B, total_items) exact sequence log-probs, chunked over users and
        targets so the flattened decoder batch stays bounded."""
        N = len(self.sid_table)
        B = int(enc_out.shape[0])
        n_levels = len(self.level_sizes)
        offsets_d = jnp.asarray(self.offsets)

        tc = min(512, N)
        uc = min(32, B)
        sid = self.sid_table
        pad_n = (-N) % tc
        if pad_n:
            sid = np.concatenate([sid, np.repeat(sid[-1:], pad_n, axis=0)])
        pad_b = (-B) % uc
        if pad_b:
            enc_out = jnp.concatenate(
                [enc_out, jnp.repeat(enc_out[-1:], pad_b, axis=0)]
            )
            enc_mask = jnp.concatenate(
                [enc_mask, jnp.repeat(enc_mask[-1:], pad_b, axis=0)]
            )

        scores = np.empty((B + pad_b, N + pad_n), dtype="float")
        for us in range(0, B + pad_b, uc):
            eo, em = enc_out[us : us + uc], enc_mask[us : us + uc]
            for ts in range(0, N + pad_n, tc):
                scores[us : us + uc, ts : ts + tc] = np.asarray(
                    _exact_cross_scores(
                        self.params, offsets_d,
                        jnp.asarray(sid[ts : ts + tc]),
                        eo, em, self.num_heads, n_levels,
                    )
                )
        out = np.full((B, self.total_items), -1e10, dtype="float")
        out[:, :N] = scores[:B, :N]
        return out

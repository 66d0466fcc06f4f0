"""SASRec — Self-Attentive Sequential Recommendation (Kang & McAuley,
ICDM 2018).

Capability parity with reference ``cornac/models/sasrec/recom_sasrec.py:124``
(torch transformer; losses from ``seq_utils/losses.py``; optional positional
embedding and item output biases; best-on-val selection). TPU design: causal
multi-head self-attention blocks in pure JAX over padded fixed-length
sessions (static shapes; sessions are short so dense attention is the right
call — SURVEY §5 long-context note), shared input/output item embedding,
the shared :func:`cornac_tpu.models.seq_utils.batch_loss` family over
in-batch + popularity^alpha sampled negatives, optax Adam, multi-epoch
fused fit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.nn import (
    block_attention,
    block_ffn,
    init_transformer_block,
    layer_norm,
    make_drop,
)
from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender
from .seq_utils import (
    SUPPORTED_LOSSES,
    batch_loss,
    build_session_examples,
    neg_sampling_table,
    pad_batch_rows,
    pad_histories,
    sample_negatives,
    sessions_per_batch,
    val_score,
)


def _init_sasrec(rng, vocab, d, n_layers, max_len, use_pos_emb, use_biases):
    def xav(shape):
        return jnp.asarray(xavier_uniform(shape, rng))

    blocks = [init_transformer_block(xav, d, ffn_mult=1) for _ in range(n_layers)]
    params = {
        # + 1 row: index `vocab` is the padding id
        "emb": jnp.asarray(
            rng.normal(0, 0.02, (vocab + 1, d)).astype(np.float32)
        ),
        "blocks": blocks,
        "ln_f_g": jnp.ones(d, jnp.float32),
        "ln_f_b": jnp.zeros(d, jnp.float32),
    }
    if use_pos_emb:
        params["pos"] = jnp.asarray(
            rng.normal(0, 0.02, (max_len, d)).astype(np.float32)
        )
    if use_biases:
        params["out_b"] = jnp.zeros(vocab + 1, jnp.float32)
    return params


# back-compat alias: transformer_rec historically imported this from here
_layernorm = layer_norm


@partial(jax.jit, static_argnames=("pad_id", "n_heads", "n_items"))
def _sasrec_scores(params, seq, pad_id, n_heads, n_items):
    """Jitted inference: next-item logits for left-padded histories. The
    eager (unjitted) forward costs one dispatch per op through the runtime;
    fusing the whole scorer is a >20x eval-latency win (PERF.md)."""
    states = _sasrec_states(params, seq, pad_id, n_heads)
    last = states[:, -1, :]  # left-padded: last column is most recent
    logits = last @ params["emb"][:n_items].T
    if "out_b" in params:
        logits = logits + params["out_b"][:n_items][None, :]
    return logits


def _sasrec_states(params, seq, pad_id, n_heads, dropout=0.0, drop_key=None):
    """(B, L, d) causal-transformer states; padded positions attend nowhere
    and are zeroed. ``dropout`` (training only) applies inverted dropout to
    the embedded input and each block's attention/FFN outputs, matching the
    reference torch module's placement."""
    B, L = seq.shape
    d = params["emb"].shape[1]
    key_mask = seq != pad_id  # (B, L)

    h = params["emb"][seq] * np.sqrt(d)
    if "pos" in params:
        h = h + params["pos"][None, :, :]
    h = h * key_mask[:, :, None]

    drop = make_drop(dropout, drop_key)
    h = drop(h, 0)

    causal = jnp.tril(jnp.ones((L, L), bool))
    attn_mask = causal[None, :, :] & key_mask[:, None, :]  # (B, L, L)

    for bi, blk in enumerate(params["blocks"]):
        # SASRec quirk kept from the original implementation: queries are
        # layer-normed, keys/values come from the raw residual stream
        q = layer_norm(h, blk["ln1_g"], blk["ln1_b"])
        h = h + block_attention(blk, q, h, attn_mask, n_heads, drop, 2 * bi + 1)
        h = h + block_ffn(blk, h, drop, 2 * bi + 2, act=jax.nn.relu)
        h = h * key_mask[:, :, None]

    return layer_norm(h, params["ln_f_g"], params["ln_f_b"])


class SASRec(NextItemRecommender):
    """Causal-attention next-item model on padded session batches.

    Parameters mirror the reference (``recom_sasrec.py:124-151``):
    ``embedding_dim``, ``loss`` (ce/cross-entropy/xe_softmax/softmax/bpr/
    bpr-max/top1/bce), ``n_sample``/``sample_alpha`` (shared popularity^alpha
    negatives), ``num_blocks``/``num_heads``/``dropout``, ``l2_reg``,
    ``bpreg``/``elu_param`` (bpr-max), ``use_pos_emb``, ``use_biases``
    (item output biases), ``device`` (no-op), ``model_selection`` 'last'/
    'best' with ``val_eval_every``/``val_k``/``val_metric``. ``n_layers``
    is kept as an alias of ``num_blocks``.
    """

    def __init__(
        self,
        name="SASRec",
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
        device="cpu",
        use_pos_emb=True,
        use_biases=False,
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
        if loss not in SUPPORTED_LOSSES:
            raise ValueError(
                f"loss='{loss}' not supported; choose from {SUPPORTED_LOSSES}"
            )
        if model_selection not in ("last", "best"):
            raise ValueError(
                f"model_selection='{model_selection}' not supported; "
                "choose 'last' or 'best'"
            )
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
        self.device = device  # no-op: XLA owns placement on TPU
        self.use_pos_emb = use_pos_emb
        self.use_biases = use_biases
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
        pad_id = vocab
        if not hasattr(self, "params"):
            self.params = _init_sasrec(
                self.rng,
                vocab,
                self.embedding_dim,
                self.num_blocks,
                self.max_len,
                self.use_pos_emb,
                self.use_biases,
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
        # batch_size counts EVENTS (reference semantics: session_seq_iter
        # yields one prefix example per event, recom_sasrec.py:226-237):
        # size session-row batches so optimizer updates per epoch match
        bsz = sessions_per_batch(self.batch_size, mask, n)
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

        # reference optimizer: Adam betas=(0.9, 0.98) (recom_sasrec.py:215-217)
        optimizer = optax.adam(self.learning_rate, b1=0.9, b2=0.98)
        opt_state = optimizer.init(self.params)
        n_heads = self.num_heads
        l2 = self.l2_reg
        loss_kind = self.loss
        n_sample = self.n_sample
        dropout = float(self.dropout)
        bpreg, elu_param = self.bpreg, self.elu_param

        cum_probs = neg_sampling_table(train_set, self.sample_alpha, vocab)

        def loss_fn(params, seq, tgt, m, key):
            k_drop, k_neg = jax.random.split(key)
            states = _sasrec_states(
                params, seq, pad_id, n_heads, dropout=dropout, drop_key=k_drop
            )
            negs = sample_negatives(k_neg, cum_probs, (n_sample,))
            out_bias = params.get("out_b")
            loss = batch_loss(
                loss_kind,
                states,
                params["emb"],
                out_bias,
                tgt,
                m,
                negs,
                bpreg=bpreg,
                elu_param=elu_param,
            )
            if l2 > 0:
                loss = loss + l2 * sum(
                    jnp.sum(p**2)
                    for p in (
                        [params["emb"]] + ([params["pos"]] if "pos" in params else [])
                    )
                )
            return loss

        inputs_d = jnp.asarray(inputs)
        targets_d = jnp.asarray(targets)
        mask_d = jnp.asarray(mask)

        # data-parallel over the mesh: params/opt replicated, minibatches
        # sharded across every device (GSPMD psums the grads)
        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all

            batch_shard = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            self.params, opt_state, inputs_d, targets_d, mask_d = replicate_all(
                self.mesh, self.params, opt_state, inputs_d, targets_d, mask_d
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epochs(params, opt_state, key, n_epochs, epoch_offset):
            def epoch(e, carry):
                params, opt_state, _ = carry
                # global epoch index: stream invariant to host chunking
                ekey = jax.random.fold_in(key, epoch_offset + e)
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

        def run_chunk(state, start, e):
            params, opt_state, best_params, best_score = state
            params, opt_state, loss_sum = run_epochs(
                params, opt_state, key, e, start
            )
            info = {"loss": loss_sum}
            if select_best:
                self.params = params
                score = val_score(
                    self, train_set, val_set, self.val_metric, self.val_k
                )
                info["val"] = score
                if score > float(best_score):
                    # deep copy: params buffers are donated to the next
                    # run_epochs call and would be invalidated
                    best_params = jax.tree_util.tree_map(jnp.array, params)
                    best_score = jnp.float32(score)
            return (params, opt_state, best_params, best_score), info

        def report(done, info):
            print(
                "Epoch %d/%d, loss: %.4f"
                % (done, self.n_epochs, float(info["loss"]) / n_batches)
            )
            if "val" in info:
                print(
                    "  val %s@%d = %.4f"
                    % (self.val_metric, self.val_k, info["val"])
                )

        # best-so-far rides in the training state so checkpoint/resume
        # preserves model selection across interruptions
        state = (
            self.params,
            opt_state,
            jax.tree_util.tree_map(jnp.array, self.params),
            jnp.float32(-np.inf),
        )
        self.params, opt_state, best_params, best_score = epoch_loop(
            self,
            self.n_epochs,
            run_chunk,
            state,
            on_report=report,
            max_chunk=self.val_eval_every if select_best else None,
        )
        if select_best and np.isfinite(float(best_score)):
            self.params = best_params
        return self

    def score(self, user_idx, history_items, **kwargs):
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        pad_id = self.num_items
        padded, lengths = pad_histories(histories, self.max_len, pad_value=pad_id)
        (padded,), B = pad_batch_rows([padded])
        seq = jnp.asarray(padded)
        if self.mesh is not None and padded.shape[0] % self.mesh.size == 0:
            # data-parallel inference: histories sharded across the mesh
            # (params are replicated by the mesh fit path)
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            seq = _jax.device_put(
                seq,
                NamedSharding(self.mesh, P(tuple(self.mesh.axis_names), None)),
            )
        logits = _sasrec_scores(
            self.params, seq, pad_id, self.num_heads, self.num_items
        )
        return np.asarray(logits, dtype=np.float64)[:B]

"""GRU4Rec — session-based RNN recommendation (Hidasi et al., ICLR 2016;
Hidasi & Karatzoglou, CIKM 2018).

Capability parity with reference ``cornac/models/gru4rec/recom_gru4rec.py:38``
(torch GRU, losses ``seq_utils/losses.py``: cross-entropy/bpr/bpr-max/top1/
bce/ce over in-batch + shared sampled negatives, logQ correction,
IndexedAdagradM optimizer, best-on-val model selection). TPU redesign:

- The reference's session-parallel minibatching (many open sessions
  advanced one step per batch, built for CPU/GPU RNNs) becomes padded
  fixed-length session batches — static shapes, whole batch per device
  step, multi-epoch ``lax.fori_loop`` in one compiled program.
- The loss family is shared :func:`cornac_tpu.models.seq_utils.batch_loss`:
  per (row, step) the score row is [in-batch negatives at the same step |
  shared popularity^alpha sampled negatives], positives on the diagonal —
  the reference's (B, B+n_sample) score matrix generalized over steps. The
  shared negative draw serves all L steps of a batch (same distribution,
  fewer gathers).
- ``IndexedAdagradM`` (adagrad + momentum over touched rows) maps to
  :func:`cornac_tpu.models.seq_utils.adagrad_m` with the reference's exact
  semantics (zero-initialized accumulator, eps inside the sqrt); on TPU
  the dense-table update is a matmul-class op, so the "indexed" sparsity
  trick isn't needed. ``batch_size`` counts events, so row batches hold
  ``batch_size / avg_session_len`` sessions — keeping the reference's
  optimizer-updates-per-epoch (adagrad stalls with ~30x fewer updates).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import get_rng
from ..utils.checkpoint import epoch_loop
from ..utils.init_utils import xavier_uniform
from .recommender import NextItemRecommender
from .seq_utils import (
    SUPPORTED_LOSSES,
    adagrad_m,
    batch_loss,
    build_session_examples,
    neg_sampling_table,
    pad_batch_rows,
    pad_histories,
    sample_negatives,
    sessions_per_batch,
    val_score,
)


def _init_gru(rng, vocab, layers, embedding, constrained):
    """Parameter pytree: optional input embedding, stacked GRU cells, output
    table. ``constrained`` ties the input embedding to ``out_emb``
    (reference GRU4RecModel constrained_embedding), so the input width is
    the last layer's size."""

    def xav(shape):
        return jnp.asarray(xavier_uniform(shape, rng))

    out_dim = layers[-1]
    if constrained:
        emb = None
        in_dim = out_dim
    else:
        e = embedding if embedding else layers[0]
        emb = jnp.asarray(rng.normal(0, 0.05, (vocab, e)).astype(np.float32))
        in_dim = e

    cells = []
    for h in layers:
        cells.append(
            {
                "W_z": xav((in_dim, h)),
                "U_z": xav((h, h)),
                "b_z": jnp.zeros(h, jnp.float32),
                "W_r": xav((in_dim, h)),
                "U_r": xav((h, h)),
                "b_r": jnp.zeros(h, jnp.float32),
                "W_h": xav((in_dim, h)),
                "U_h": xav((h, h)),
                "b_h": jnp.zeros(h, jnp.float32),
            }
        )
        in_dim = h

    params = {
        "cells": cells,
        "out_emb": jnp.asarray(
            rng.normal(0, 0.05, (vocab, out_dim)).astype(np.float32)
        ),
        "out_b": jnp.zeros(vocab, jnp.float32),
    }
    if emb is not None:
        params["emb"] = emb
    return params


def _gru_states(params, seq, step_mask=None, drop_masks=None):
    """(B, L, H_last) top-layer hidden states over an item-id sequence.

    ``step_mask`` (B, L) marks real steps; on padding steps every layer's
    state carries through unchanged (needed for left-padded inference
    histories). ``drop_masks`` (training only) is a dict with "embed"
    (B, L, E) and "hidden" (list of (B, L, H_i)) inverted-dropout masks.
    """
    emb_table = params.get("emb", params["out_emb"])
    x = emb_table[seq]  # (B, L, E)
    if step_mask is None:
        step_mask = jnp.ones(seq.shape, jnp.float32)
    if drop_masks is not None:
        x = x * drop_masks["embed"]

    inputs = x
    for li, cell in enumerate(params["cells"]):
        # the scan is the latency floor of this model, so keep it lean:
        # all three input projections are sequence-parallel — compute them
        # OUTSIDE the scan as one (B, L, 3H) MXU matmul — and the z/r
        # recurrent projections share h, so they fuse into one (H, 2H)
        # matmul per step. 2 small matmuls inside the scan instead of 6;
        # per-column dot products are unchanged (concat along the output
        # axis), so the math is identical.
        H = cell["U_z"].shape[0]
        W = jnp.concatenate([cell["W_z"], cell["W_r"], cell["W_h"]], axis=1)
        bias = jnp.concatenate([cell["b_z"], cell["b_r"], cell["b_h"]])
        U_zr = jnp.concatenate([cell["U_z"], cell["U_r"]], axis=1)
        proj = inputs @ W + bias  # (B, L, 3H), hoisted off the scan path

        def gru_cell(h, inp, U_zr=U_zr, U_h=cell["U_h"], H=H):
            p_t, m_t = inp
            rec = h @ U_zr  # (B, 2H): z and r recurrent parts together
            z = jax.nn.sigmoid(p_t[:, :H] + rec[:, :H])
            r = jax.nn.sigmoid(p_t[:, H : 2 * H] + rec[:, H:])
            h_tilde = jnp.tanh(p_t[:, 2 * H :] + (r * h) @ U_h)
            h_new = (1 - z) * h + z * h_tilde
            h_new = m_t[:, None] * h_new + (1 - m_t[:, None]) * h
            return h_new, h_new

        h0 = jnp.zeros((seq.shape[0], H), jnp.float32)
        _, states = jax.lax.scan(
            gru_cell,
            h0,
            (jnp.swapaxes(proj, 0, 1), jnp.swapaxes(step_mask, 0, 1)),
        )
        states = jnp.swapaxes(states, 0, 1)  # (B, L, H_i)
        if drop_masks is not None:
            states = states * drop_masks["hidden"][li]
        inputs = states
    return inputs


@jax.jit
def _gru_last_state(params, seq, step_mask):
    """Jitted inference: final top-layer GRU state per left-padded history
    (the eager forward costs one dispatch per scan step through the
    runtime)."""
    return _gru_states(params, seq, step_mask)[:, -1, :]


class GRU4Rec(NextItemRecommender):
    """GRU session model trained on padded session batches.

    Parameters mirror the reference (``recom_gru4rec.py:124-150``):
    ``layers`` (stacked hidden sizes), ``loss`` (cross-entropy/xe_softmax/
    softmax/bpr/bpr-max/top1/bce/ce), ``dropout_p_embed``/
    ``dropout_p_hidden``, ``momentum`` (adagrad momentum), ``sample_alpha``
    (popularity exponent for shared negatives), ``n_sample``, ``embedding``
    (separate input-embedding size, 0 = layers[0], "layersize" = layers[0]),
    ``constrained_embedding`` (tie input to output table), ``bpreg``/
    ``elu_param`` (bpr-max), ``logq`` (sampled-softmax logQ correction),
    ``device`` (accepted, no-op — placement is XLA's), ``model_selection``
    ('last' or 'best' with ``val_eval_every``/``val_k``/``val_metric``).
    """

    def __init__(
        self,
        name="GRU4Rec",
        layers=None,
        loss="cross-entropy",
        batch_size=512,
        dropout_p_embed=0.0,
        dropout_p_hidden=0.0,
        learning_rate=0.05,
        momentum=0.0,
        sample_alpha=0.5,
        n_sample=2048,
        embedding=0,
        constrained_embedding=True,
        n_epochs=10,
        bpreg=1.0,
        elu_param=0.5,
        logq=0.0,
        device="cpu",
        model_selection="last",
        val_eval_every=5,
        val_k=20,
        val_metric="recall",
        max_len=50,
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
        self.layers = [100] if layers is None else list(layers)
        self.loss = loss
        self.batch_size = batch_size
        self.dropout_p_embed = dropout_p_embed
        self.dropout_p_hidden = dropout_p_hidden
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.sample_alpha = sample_alpha
        self.n_sample = n_sample
        self.embedding = self.layers[0] if embedding == "layersize" else embedding
        self.constrained_embedding = constrained_embedding
        self.n_epochs = n_epochs
        self.bpreg = bpreg
        self.elu_param = elu_param
        self.logq = logq
        self.device = device  # no-op: XLA owns placement on TPU
        self.model_selection = model_selection
        self.val_eval_every = val_eval_every
        self.val_k = val_k
        self.val_metric = val_metric
        self.max_len = max_len
        self.seed = seed
        self.mesh = mesh
        self.rng = get_rng(seed)

    def fit(self, train_set, val_set=None):
        super().fit(train_set, val_set)
        if not self.trainable:
            return self

        vocab = self.total_items
        if not hasattr(self, "params"):
            self.params = _init_gru(
                self.rng,
                vocab,
                self.layers,
                self.embedding,
                self.constrained_embedding,
            )

        users, inputs, targets, mask = build_session_examples(
            train_set, self.max_len
        )
        # trim training width to the longest real session: the GRU scan is
        # sequential in L, so padded steps cost real wall-clock
        L = max(1, int(mask.sum(axis=1).max()))
        inputs, targets, mask = inputs[:, :L], targets[:, :L], mask[:, :L]
        n = len(users)
        # batch_size counts EVENTS (reference semantics): size row batches
        # so updates-per-epoch matches the reference's session-parallel
        # iterator (seq_utils.sessions_per_batch)
        bsz = sessions_per_batch(self.batch_size, mask, n)
        n_pad = (-n) % bsz
        if n_pad:
            inputs = np.concatenate([inputs, np.zeros((n_pad, L), np.int32)])
            targets = np.concatenate([targets, np.zeros((n_pad, L), np.int32)])
            mask = np.concatenate([mask, np.zeros((n_pad, L), np.float32)])
        n_batches = inputs.shape[0] // bsz

        optimizer = adagrad_m(self.learning_rate, self.momentum)
        opt_state = optimizer.init(self.params)

        loss_kind = self.loss
        n_sample = self.n_sample
        bpreg, elu_param = self.bpreg, self.elu_param
        logq, sample_alpha = self.logq, self.sample_alpha
        p_embed, p_hidden = self.dropout_p_embed, self.dropout_p_hidden
        layers = self.layers

        cum_probs = neg_sampling_table(train_set, sample_alpha, vocab)
        if logq > 0:
            counts = np.bincount(
                np.asarray(train_set.uir_tuple[1]), minlength=vocab
            ).astype(np.float64)
            log_p0 = jnp.asarray(
                np.log(counts / max(counts.sum(), 1.0) + 1e-24), jnp.float32
            )
        else:
            log_p0 = None

        emb_dim = (
            layers[-1]
            if self.constrained_embedding
            else (self.embedding if self.embedding else layers[0])
        )

        def make_drop_masks(key, B, L):
            if p_embed <= 0 and p_hidden <= 0:
                return None
            ks = jax.random.split(key, 1 + len(layers))
            keep_e = 1.0 - p_embed
            embed = (
                jax.random.bernoulli(ks[0], keep_e, (B, L, emb_dim)) / keep_e
                if p_embed > 0
                else jnp.ones((B, L, emb_dim))
            )
            hidden = []
            keep_h = 1.0 - p_hidden
            for li, h in enumerate(layers):
                hidden.append(
                    jax.random.bernoulli(ks[1 + li], keep_h, (B, L, h)) / keep_h
                    if p_hidden > 0
                    else jnp.ones((B, L, h))
                )
            return {"embed": embed.astype(jnp.float32), "hidden": [m.astype(jnp.float32) for m in hidden]}

        def loss_fn(params, seq, tgt, m, key):
            k_drop, k_neg = jax.random.split(key)
            drop = make_drop_masks(k_drop, seq.shape[0], seq.shape[1])
            states = _gru_states(params, seq, step_mask=m, drop_masks=drop)
            negs = sample_negatives(k_neg, cum_probs, (n_sample,))
            return batch_loss(
                loss_kind,
                states,
                params["out_emb"],
                params["out_b"],
                tgt,
                m,
                negs,
                logq=logq,
                log_p0=log_p0,
                sample_alpha=sample_alpha,
                bpreg=bpreg,
                elu_param=elu_param,
            )

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

    def _history_states(self, histories):
        padded, lengths = pad_histories(histories, self.max_len)
        step_mask = (
            np.arange(self.max_len)[None, :] >= (self.max_len - lengths)[:, None]
        ).astype(np.float32)
        (padded, step_mask), B = pad_batch_rows([padded, step_mask])
        seq, m = jnp.asarray(padded), jnp.asarray(step_mask)
        if self.mesh is not None and padded.shape[0] % self.mesh.size == 0:
            # data-parallel inference: histories sharded across the mesh
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            seq, m = _jax.device_put(seq, spec), _jax.device_put(m, spec)
        states = _gru_last_state(self.params, seq, m)
        return states[:B]  # last state (histories are left-padded)

    def score(self, user_idx, history_items, **kwargs):
        return self.score_history_batch([user_idx], [list(history_items)])[0]

    def score_history_batch(self, user_indices, histories):
        h = self._history_states(histories)
        logits = h @ self.params["out_emb"].T + self.params["out_b"]
        return np.asarray(logits, dtype=np.float64)[:, : self.num_items]

"""Shared utilities for sequential (next-item) models.

Capability parity with reference ``cornac/models/seq_utils``
(``iterators.py:26-260`` session batching, ``losses.py:23-100`` ranking
losses incl. logQ-corrected sampled cross-entropy). TPU redesign: the
reference's session-parallel minibatching (many open sessions advanced one
step per batch, built for CPU RNN training) becomes padded fixed-length
session batches with masking — static shapes, whole batch per device step.
"""

import jax
import jax.numpy as jnp
import numpy as np


def adagrad_m(learning_rate, momentum=0.0, eps=1e-6):
    """Reference ``IndexedAdagradM`` semantics (``seq_utils/optim.py``):
    the squared-gradient accumulator starts at ZERO and eps sits inside the
    sqrt, so the first update per coordinate has magnitude ~lr. (optax's
    ``scale_by_rss`` initializes the accumulator at 0.1, which shrinks
    early steps ~30x at these gradient scales and stalls adagrad training
    — measured as the root cause of GRU4Rec failing to learn.) Momentum
    accumulates the scaled step like the reference (mom = momentum*mom +
    lr*g/sqrt(acc+eps))."""
    import optax

    def init(params):
        acc = jax.tree_util.tree_map(jnp.zeros_like, params)
        if momentum > 0:
            return (acc, jax.tree_util.tree_map(jnp.zeros_like, params))
        return (acc,)

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(lambda a, g: a + g * g, state[0], grads)
        scaled = jax.tree_util.tree_map(
            lambda g, a: -learning_rate * g * jax.lax.rsqrt(a + eps), grads, acc
        )
        if momentum > 0:
            mom = jax.tree_util.tree_map(
                lambda m, s: momentum * m + s, state[1], scaled
            )
            return mom, (acc, mom)
        return scaled, (acc,)

    return optax.GradientTransformation(init, update)


def sessions_per_batch(batch_size, mask, n_rows):
    """Reference ``batch_size`` counts EVENTS (its session-parallel
    iterator advances ``batch_size`` sessions one step per optimizer
    update), while the padded-session layout packs a whole session per
    row. Matching the events-per-update semantics — and, critically, the
    reference's optimizer-updates-per-epoch — means sizing row batches at
    ``batch_size / avg_session_len`` sessions."""
    avg_len = float(np.asarray(mask).sum()) / max(n_rows, 1)
    return int(min(max(1, round(batch_size / max(avg_len, 1.0))), n_rows))


def build_session_examples(train_set, max_len):
    """Flatten a SequentialDataset into (user, input seq, target seq) padded
    arrays: inputs = session[:-1], targets = session[1:], right-padded.

    Returns (users, inputs, targets, mask) numpy arrays with shapes
    (n_sessions,), (n_sessions, max_len), (n_sessions, max_len),
    (n_sessions, max_len). Sessions longer than max_len + 1 keep their most
    recent max_len + 1 items.
    """
    users_arr = train_set.uir_tuple[0]
    item_arr = train_set.uir_tuple[1]

    users, inputs, targets, lengths = [], [], [], []
    for sid, idx_list in train_set.sessions.items():
        items = [int(item_arr[i]) for i in idx_list]
        if len(items) < 2:
            continue
        items = items[-(max_len + 1) :]
        users.append(int(users_arr[idx_list[0]]))
        seq_in = items[:-1]
        seq_out = items[1:]
        lengths.append(len(seq_in))
        pad = max_len - len(seq_in)
        inputs.append(seq_in + [0] * pad)
        targets.append(seq_out + [0] * pad)

    if not users:
        raise ValueError("No session with at least 2 items to train on.")

    users = np.asarray(users, dtype=np.int32)
    inputs = np.asarray(inputs, dtype=np.int32)
    targets = np.asarray(targets, dtype=np.int32)
    mask = np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]
    return users, inputs, targets, mask.astype(np.float32)


def pad_histories(histories, max_len, pad_value=0):
    """Right-align recent history into fixed-length left-padded rows.

    Returns (B, max_len) int32 and (B,) lengths. Left-padding keeps the most
    recent item in the last column, which is what recurrent/attention
    forwards want for next-step prediction.
    """
    B = len(histories)
    out = np.full((B, max_len), pad_value, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for b, h in enumerate(histories):
        h = list(h)[-max_len:]
        if h:
            out[b, -len(h) :] = h
        lengths[b] = len(h)
    return out, lengths


def xe_loss(logits, targets, mask):
    """Masked full-softmax cross-entropy (reference losses.py 'xe')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bpr_max_loss(pos_scores, neg_scores, neg_mask, bpreg=1.0):
    """BPR-max over sampled negatives (Hidasi & Karatzoglou, CIKM 2018).

    pos_scores: (...,); neg_scores/neg_mask: (..., n_neg).
    """
    w = jax.nn.softmax(
        jnp.where(neg_mask > 0, neg_scores, -jnp.inf), axis=-1
    )
    diff = jax.nn.sigmoid(pos_scores[..., None] - neg_scores)
    core = -jnp.log(jnp.sum(w * diff * neg_mask, axis=-1) + 1e-24)
    reg = bpreg * jnp.sum(w * neg_scores**2 * neg_mask, axis=-1)
    return core + reg


def top1_loss(pos_scores, neg_scores, neg_mask):
    """TOP1 loss (Hidasi et al., ICLR 2016)."""
    diff = jax.nn.sigmoid(neg_scores - pos_scores[..., None])
    reg = jax.nn.sigmoid(neg_scores**2)
    per_neg = (diff + reg) * neg_mask
    return jnp.sum(per_neg, axis=-1) / jnp.maximum(jnp.sum(neg_mask, axis=-1), 1.0)


def sampled_xe_logq(pos_scores, neg_scores, neg_counts, total_count, neg_mask):
    """Sampled softmax cross-entropy with logQ correction (reference
    losses.py 'xe' with logq > 0): subtract log of the sampling probability
    from negative logits so popular negatives are not over-penalized."""
    logq = jnp.log(neg_counts / total_count + 1e-24)
    corrected = jnp.where(neg_mask > 0, neg_scores - logq, -jnp.inf)
    all_scores = jnp.concatenate([pos_scores[..., None], corrected], axis=-1)
    return -jax.nn.log_softmax(all_scores, axis=-1)[..., 0]


SUPPORTED_LOSSES = (
    "cross-entropy",
    "xe_softmax",
    "softmax",
    "bpr",
    "bpr-max",
    "top1",
    "bce",
    "ce",
)


def neg_sampling_table(train_set, sample_alpha, total_items):
    """Cumulative popularity^alpha distribution for shared negative
    sampling (reference ``seq_utils/iterators.py`` sample_alpha semantics:
    negatives drawn with probability proportional to freq**alpha;
    alpha=0 -> uniform over seen items)."""
    counts = np.bincount(
        np.asarray(train_set.uir_tuple[1]), minlength=total_items
    ).astype(np.float64)
    w = counts**sample_alpha
    w[counts == 0] = 0.0
    total = w.sum()
    if total <= 0:
        w = np.ones(total_items)
        total = w.sum()
    return jnp.asarray(np.cumsum(w / total), dtype=jnp.float32)


def sample_negatives(key, cum_probs, shape):
    """Inverse-CDF draw of negative item ids on device."""
    u = jax.random.uniform(key, shape)
    return jnp.clip(
        jnp.searchsorted(cum_probs, u), 0, cum_probs.shape[0] - 1
    ).astype(jnp.int32)


def batch_loss(
    loss_kind,
    states,
    out_emb,
    out_bias,
    targets,
    mask,
    neg_ids,
    logq=0.0,
    log_p0=None,
    sample_alpha=0.5,
    bpreg=1.0,
    elu_param=0.5,
):
    """Reference loss family over padded session batches.

    Mirrors ``seq_utils/losses.py``: for every valid (row, step) the score
    row is [in-batch negatives at the same step | shared sampled
    negatives], positives on the diagonal of the first block. The reference
    draws the shared negatives per session-parallel minibatch (one step);
    here one draw serves all ``L`` steps of the batch — same distribution,
    fewer gathers.

    states (B,L,H); targets/mask (B,L); neg_ids (N,). Returns scalar mean
    loss over valid positions.
    """
    B, L, H = states.shape
    tgt_emb = out_emb[targets]  # (B, L, H)
    # in-batch block: scores[b, t, c] = states[b,t] . out_emb[targets[c,t]]
    sc_in = jnp.einsum("bth,cth->btc", states, tgt_emb)
    sc_neg = jnp.einsum("bth,nh->btn", states, out_emb[neg_ids])
    # (1, L, B) view of a per-(column, step) quantity q[c, t]
    by_col = lambda q: jnp.swapaxes(q, 0, 1)[None, :, :]
    if out_bias is not None:
        sc_in = sc_in + by_col(out_bias[targets])
        sc_neg = sc_neg + out_bias[neg_ids][None, None, :]

    if logq > 0.0 and log_p0 is not None:
        # logQ correction (losses.py xe_softmax_loss): in-batch negatives
        # are popularity-distributed, sampled ones follow pop**alpha
        sc_in = sc_in - logq * by_col(log_p0[targets])
        sc_neg = sc_neg - logq * sample_alpha * log_p0[neg_ids][None, None, :]

    # column validity: in-batch column c at step t is real iff mask[c, t]
    col_valid = jnp.broadcast_to(by_col(mask), sc_in.shape)
    scores = jnp.concatenate([sc_in, sc_neg], axis=-1)  # (B, L, B+N)
    valid = jnp.concatenate([col_valid, jnp.ones_like(sc_neg)], axis=-1)
    diag = jnp.broadcast_to(
        jnp.concatenate(
            [jnp.eye(B, dtype=bool), jnp.zeros((B, sc_neg.shape[-1]), bool)],
            axis=-1,
        )[:, None, :],
        scores.shape,
    )
    pos = jnp.einsum("bth,bth->bt", states, tgt_emb)
    if out_bias is not None:
        pos = pos + out_bias[targets]
    if logq > 0.0 and log_p0 is not None:
        pos = pos - logq * log_p0[targets]

    neg_inf = jnp.float32(-1e30)
    if loss_kind in ("cross-entropy", "xe_softmax", "softmax", "ce"):
        masked = jnp.where(valid > 0, scores, neg_inf)
        lse = jax.nn.logsumexp(masked, axis=-1)
        per_pos = lse - pos
    elif loss_kind == "bpr":
        lg = jax.nn.log_sigmoid(pos[..., None] - scores) * valid * (~diag)
        denom = jnp.maximum(jnp.sum(valid * (~diag), axis=-1), 1.0)
        per_pos = -jnp.sum(lg, axis=-1) / denom
    elif loss_kind == "bpr-max":
        s = scores
        if elu_param > 0:
            s = jax.nn.elu(s, elu_param)
        w = jax.nn.softmax(
            jnp.where((valid > 0) & (~diag), s, neg_inf), axis=-1
        )
        sig = jax.nn.sigmoid(pos[..., None] - s)
        core = -jnp.log(
            jnp.sum(w * sig * valid * (~diag), axis=-1) + 1e-24
        )
        reg = bpreg * jnp.sum(w * s**2 * valid * (~diag), axis=-1)
        per_pos = core + reg
    elif loss_kind == "top1":
        term = (
            jax.nn.sigmoid(scores - pos[..., None])
            + jax.nn.sigmoid(scores**2)
        ) * valid
        denom = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
        per_pos = jnp.sum(term, axis=-1) / denom - jax.nn.sigmoid(
            pos**2
        ) / denom
    elif loss_kind == "bce":
        logits = jnp.where(valid > 0, scores, neg_inf)
        labels = diag.astype(jnp.float32)
        per_col = (
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        ) * valid
        per_pos = jnp.sum(per_col, axis=-1) / jnp.maximum(
            jnp.sum(valid, axis=-1), 1.0
        )
    else:
        raise ValueError(f"unknown loss {loss_kind!r}")

    return jnp.sum(per_pos * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def val_score(model, train_set, val_set, metric="recall", k=20):
    """Next-item validation metric for best-on-val model selection
    (reference ``seq_utils/selection.py:19``)."""
    if val_set is None:
        return None

    from ..eval_methods.next_item_evaluation import ranking_eval
    from ..metrics import AUC, MRR, NDCG, Recall

    name = metric.lower()
    if name == "recall":
        m = Recall(k=k)
    elif name == "ndcg":
        m = NDCG(k=k)
    elif name == "auc":
        m = AUC()
    elif name == "mrr":
        m = MRR()
    else:
        raise ValueError(
            f"unknown validation metric {metric!r}; "
            "choose recall, ndcg, auc, or mrr"
        )
    avg_results, _ = ranking_eval(
        model, [m], train_set, val_set, mode="last"
    )
    return avg_results[0]


def pad_batch_rows(arrs, multiple=64):
    """Pad the leading (batch) dim of each array up to a multiple by
    repeating the last row; returns (padded arrays, original B). Bounds the
    number of distinct batch shapes jitted inference scorers compile for."""
    B = arrs[0].shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return arrs, B
    out = []
    for a in arrs:
        out.append(np.concatenate([a, np.repeat(a[-1:], pad, axis=0)]))
    return out, B

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

"""Shared machinery for review-based rating models (NARRE, HRDR).

Mirrors the data/compute patterns of reference
``cornac/models/narre/narre.py:28-74`` (TextProcessor CNN + ``get_data``
review batching) as static JAX ops: review documents are packed ONCE into
dense device tensors ``(N, R, L)`` (entities × max_num_review ×
max_text_length) so training batches are pure gathers, and the Conv2D(1×k)
+ max-pool text processor becomes an unfolded window einsum — a batched
matmul on the MXU, no conv primitive needed for the short L used here.
"""

import jax
import jax.numpy as jnp
import numpy as np


def build_review_tensors(train_set, max_num_review, max_text_length, by="user"):
    """Pack per-entity reviews into (N, R, L) id tensor + (N, R) partner ids
    + (N,) counts.  Reference narre.py:56-74 (get_data), hoisted out of the
    batch loop so it runs once."""
    mod = train_set.review_text
    group = mod.user_review if by == "user" else mod.item_review
    n = train_set.num_users if by == "user" else train_set.num_items
    R, L = max_num_review, max_text_length
    reviews = np.zeros((n, R, L), dtype=np.int32)
    partner = np.zeros((n, R), dtype=np.int32)
    counts = np.zeros((n,), dtype=np.int32)
    for idx in range(n):
        entries = list(group.get(idx, {}).items())[:R]
        if not entries:
            continue
        ids = [jdx for jdx, _ in entries]
        seqs = mod.batch_seq([rid for _, rid in entries], max_length=L)
        reviews[idx, : len(entries)] = np.asarray(seqs, dtype=np.int32)
        partner[idx, : len(entries)] = np.asarray(ids, dtype=np.int32)
        counts[idx] = len(entries)
    return reviews, partner, counts


def init_text_cnn(rng, emb_size, kernel_sizes, n_filters):
    """Conv kernels (ks, E, F) + bias per kernel size (torch/keras-like
    uniform fan-in init)."""
    convs = []
    for ks in kernel_sizes:
        bound = 1.0 / np.sqrt(ks * emb_size)
        convs.append({
            "w": jnp.asarray(
                rng.uniform(-bound, bound, size=(ks, emb_size, n_filters))
                .astype(np.float32)
            ),
            "b": jnp.zeros((n_filters,), jnp.float32),
        })
    return convs


def text_cnn(convs, emb, kernel_sizes):
    """emb: (..., L, E) -> (..., F * len(kernel_sizes)).

    Conv2D(1, ks) + max-pool over the full length, as in reference
    TextProcessor — expressed as a window-unfold einsum.
    """
    L = emb.shape[-2]
    outs = []
    for conv, ks in zip(convs, kernel_sizes):
        # unfold windows: (..., L-ks+1, ks, E)
        windows = jnp.stack(
            [emb[..., t : L - ks + 1 + t, :] for t in range(ks)], axis=-2
        )
        h = jnp.einsum("...wke,kef->...wf", windows, conv["w"]) + conv["b"]
        h = jax.nn.relu(h)
        outs.append(jnp.max(h, axis=-2))  # pool over positions
    return jnp.concatenate(outs, axis=-1)


def masked_attention(scores, counts, R):
    """Softmax over the review axis with padding masked out.

    scores: (B, R, 1); counts: (B,). Reference uses tf.sequence_mask +
    Softmax(axis=1).
    """
    mask = (jnp.arange(R)[None, :] < counts[:, None])[..., None]
    scores = jnp.where(mask, scores, -1e9)
    att = jax.nn.softmax(scores, axis=1)
    return att * mask  # zero out fully-padded rows' uniform leak


def init_dense_np(rng, fan_in, fan_out, bias=True):
    bound = 1.0 / np.sqrt(fan_in)
    p = {
        "w": jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_in, fan_out)).astype(np.float32)
        )
    }
    if bias:
        p["b"] = jnp.zeros((fan_out,), jnp.float32)
    return p


def apply_dense(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y

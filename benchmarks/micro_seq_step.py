"""micro_seq_step.py — roofline-style decomposition of the SASRec race.

The sequential head-to-head (PARITY_RUNS.md) shows SASRec at only 1.3x
the torch reference; "latency-bound" was asserted in r4 but never
decomposed the way micro_btree_probe.py proved BPR's floor. This harness
does that, at the exact race configuration (synthetic Markov sessions,
64-event batches, 5 epochs):

  1. splits the race wall-clock into fit vs NextItemEvaluation scoring,
  2. measures the steady-state per-epoch fit cost differentially,
  3. measures each training-step component ON DEVICE by looping it R
     times inside one compiled program (amortizing tunnel dispatch):
     embed+attention forward, loss fwd+bwd, Adam update, and the full
     step — so the component sum can be compared to the measured epoch.

If component_sum ~= measured epoch the race sits on its floor: ~190
sequential steps/epoch of microsecond-scale tensors whose per-step
device latency, not FLOPs, is the cost (equal-update-count parity with
the reference's 64-event batching forbids batching them away).

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import bench  # noqa: E402
from head_to_head_seq import SAS_KW, SEED, gen_sessions  # noqa: E402

R = 200  # on-device repetitions per component


def split_sessions():
    data = gen_sessions()
    sids = sorted({int(t[1]) for t in data})
    cut = sids[int(len(sids) * 0.85)]
    return (
        [t for t in data if int(t[1]) <= cut],
        [t for t in data if int(t[1]) > cut],
    )


def timed(fn, *args):
    """Warm once, then time; sync by pulling a scalar to host."""
    out = fn(*args)
    np.asarray(jax_leaf(out))
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax_leaf(out))
    return time.perf_counter() - t0


def jax_leaf(tree):
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].ravel()[:1]


def main():
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from cornac_tpu.eval_methods import NextItemEvaluation
    from cornac_tpu.metrics import NDCG, Recall
    from cornac_tpu.models import SASRec
    from cornac_tpu.models.sasrec import _init_sasrec, _sasrec_states
    from cornac_tpu.models.seq_utils import (
        batch_loss, build_session_examples, neg_sampling_table,
        sample_negatives, sessions_per_batch,
    )
    from cornac_tpu.utils import get_rng

    train, test = split_sessions()
    ev = NextItemEvaluation.from_splits(
        train_data=train, test_data=test, fmt="USIT",
        exclude_unknowns=True, seed=SEED, mode="next", verbose=False,
    )
    out = {}

    # ---- 1. race wall-clock split: fit vs eval --------------------------
    model = SASRec(**SAS_KW)
    t0 = time.perf_counter()
    model.fit(ev.train_set)
    out["race_fit_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    res = ev.evaluate(model, [NDCG(k=10), Recall(k=10)], user_based=False)[0]
    out["race_eval_s"] = round(time.perf_counter() - t0, 2)
    out["ndcg10"] = round(
        float(res.metric_avg_results.get("NDCG@10", float("nan"))), 4
    )

    # ---- 2. steady-state per-epoch fit cost (differential) --------------
    kw1 = dict(SAS_KW, n_epochs=1)
    kw6 = dict(SAS_KW, n_epochs=6)
    t0 = time.perf_counter()
    SASRec(**kw1).fit(ev.train_set)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    SASRec(**kw6).fit(ev.train_set)
    t6 = time.perf_counter() - t0
    out["fit_epoch_steady_s"] = round((t6 - t1) / 5, 3)

    # ---- 3. on-device component costs at the race batch shape -----------
    train_set = ev.train_set
    vocab = train_set.num_items
    pad_id = vocab
    m = SASRec(**SAS_KW)
    rng = get_rng(SEED)
    params = _init_sasrec(rng, vocab, m.embedding_dim, m.num_blocks,
                          m.max_len, m.use_pos_emb, m.use_biases)
    _, inputs, targets, mask = build_session_examples(train_set, m.max_len)
    bsz = sessions_per_batch(m.batch_size, mask, inputs.shape[0])
    n_batches = -(-inputs.shape[0] // bsz)
    out["rows_per_step"] = int(bsz)
    out["steps_per_epoch"] = int(n_batches)
    seq = jnp.asarray(inputs[:bsz].astype(np.int32))
    tgt = jnp.asarray(targets[:bsz].astype(np.int32))
    msk = jnp.asarray(mask[:bsz].astype(np.float32))
    cum_probs = neg_sampling_table(train_set, m.sample_alpha, vocab)
    n_heads, n_sample, loss_kind = m.num_heads, m.n_sample, m.loss
    optimizer = optax.adam(m.learning_rate, b1=0.9, b2=0.98)
    opt_state = optimizer.init(params)

    def loss_fn(params, key):
        k_drop, k_neg = jax.random.split(key)
        states = _sasrec_states(params, seq, pad_id, n_heads,
                                dropout=float(m.dropout), drop_key=k_drop)
        negs = sample_negatives(k_neg, cum_probs, (n_sample,))
        return batch_loss(loss_kind, states, params["emb"],
                          params.get("out_b"), tgt, msk, negs,
                          bpreg=m.bpreg, elu_param=m.elu_param)

    def rep(body):
        """Loop `body` R times inside one program; carry defeats DCE."""

        @jax.jit
        def run(params, opt_state, key):
            def it(i, carry):
                return body(i, carry, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, R, it, (params, opt_state,
                                                jnp.float32(0.0)))

        return run

    fwd = rep(lambda i, c, k: (
        c[0], c[1],
        c[2] + jnp.sum(_sasrec_states(c[0], seq, pad_id, n_heads)[0, 0])))
    fwdbwd = rep(lambda i, c, k: (
        c[0], c[1], c[2] + jax.value_and_grad(loss_fn)(c[0], k)[0]))

    grads0 = jax.grad(loss_fn)(params, jax.random.PRNGKey(0))

    def opt_body(i, c, k):
        updates, opt_state = optimizer.update(grads0, c[1], c[0])
        return optax.apply_updates(c[0], updates), opt_state, c[2]

    opt_only = rep(opt_body)

    def full_body(i, c, k):
        loss, grads = jax.value_and_grad(loss_fn)(c[0], k)
        updates, opt_state = optimizer.update(grads, c[1], c[0])
        return optax.apply_updates(c[0], updates), opt_state, c[2] + loss

    full = rep(full_body)

    key = jax.random.PRNGKey(7)
    comp = {}
    for name, prog in (("fwd", fwd), ("fwd_bwd", fwdbwd),
                       ("adam", opt_only), ("full_step", full)):
        comp[name + "_us"] = round(timed(prog, params, opt_state, key)
                                   / R * 1e6, 1)
    comp["bwd_us"] = round(comp["fwd_bwd_us"] - comp["fwd_us"], 1)
    out["step_components"] = comp
    out["component_sum_epoch_s"] = round(
        comp["full_step_us"] * n_batches / 1e6, 3
    )
    out["floor_ratio_epoch"] = round(
        out["component_sum_epoch_s"] / max(out["fit_epoch_steady_s"], 1e-9), 3
    )

    print(json.dumps({"metric": "sasrec_step_roofline", "value":
                      out["fit_epoch_steady_s"], "unit": "s/epoch",
                      "detail": out}), flush=True)


def gru_components():
    """Same decomposition for GRU4Rec's (r5 fused-gate) training step: the
    scan is the floor, so measure the full fused step on device at the
    race batch shape and compare the component-sum epoch against the
    differential per-epoch fit cost."""
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from cornac_tpu.eval_methods import NextItemEvaluation
    from cornac_tpu.models import GRU4Rec
    from head_to_head_seq import GRU_KW

    train, test = split_sessions()
    ev = NextItemEvaluation.from_splits(
        train_data=train, test_data=test, fmt="USIT",
        exclude_unknowns=True, seed=SEED, mode="next", verbose=False,
    )
    out = {}
    kw1 = dict(GRU_KW, n_epochs=1)
    kw6 = dict(GRU_KW, n_epochs=6)
    t0 = time.perf_counter()
    GRU4Rec(**kw1).fit(ev.train_set)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    GRU4Rec(**kw6).fit(ev.train_set)
    t6 = time.perf_counter() - t0
    out["fit1_s"] = round(t1, 2)
    out["fit6_s"] = round(t6, 2)
    out["fit_epoch_steady_s"] = round((t6 - t1) / 5, 3)
    print(json.dumps({"metric": "gru4rec_epoch_steady", "value":
                      out["fit_epoch_steady_s"], "unit": "s/epoch",
                      "detail": out}), flush=True)


if __name__ == "__main__":
    if "--gru" in sys.argv:
        gru_components()
    else:
        main()

"""Head-to-head vs the reference's TENSORFLOW-backed models on one host.

The reference implements WMF (a named BASELINE config), CDL, NARRE, HRDR,
Beacon and PCRL on TensorFlow (`/root/reference/cornac/models/wmf/
recom_wmf.py:28`, `cdl/recom_cdl.py:26`, `narre/recom_narre.py:29`, ...);
TF 2.x imports in this image, so these race the reference's own code
unmodified (ref_loader.load_ref_tf_models) against cornac_tpu through
identical RatioSplit -> fit -> eval pipelines on the same seeded data.

Usage:
    python benchmarks/head_to_head_tf.py --scale 100k --models WMF,CDL,PCRL
    python benchmarks/head_to_head_tf.py --models WMF --sides ref

Writes one JSON per (scale, model) under benchmarks/parity/ (tf_ prefix).
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.head_to_head import (  # noqa: E402
    SCALES, SEED, gen_data, _enable_compile_cache,
)


def text_corpus(n_items, seed=31):
    """Zipf-ish letter-only corpus (the tokenizers strip digits)."""
    rng = np.random.RandomState(seed)
    syll = ["ba", "ce", "di", "fo", "gu", "ka", "le", "mi", "no", "pu"]
    vocab = np.array(
        ["".join(w) for w in itertools.product(syll, syll, syll)][:400]
    )
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    return (
        [" ".join(rng.choice(vocab, size=50, p=p)) for _ in range(n_items)],
        [f"i{i}" for i in range(n_items)],
    )


def item_graph_edges(n_items, seed=17, deg=5):
    rng = np.random.RandomState(seed)
    edges = set()
    for i in range(n_items):
        for j in rng.randint(0, n_items, deg):
            if i != int(j):
                edges.add((f"i{i}", f"i{int(j)}", 1.0))
    return list(edges)


def model_specs():
    wmf_kw = dict(k=50, lambda_u=0.01, lambda_v=0.01, a=1.0, b=0.01,
                  learning_rate=0.001, batch_size=128, max_iter=50,
                  seed=SEED, verbose=False)
    cdl_kw = dict(k=32, autoencoder_structure=[64], act_fn="relu",
                  lambda_u=0.1, lambda_v=10, lambda_w=0.1, lambda_n=1000,
                  corruption_rate=0.3, learning_rate=0.001, batch_size=128,
                  vocab_size=200, max_iter=30, seed=SEED, verbose=False)
    pcrl_kw = dict(k=32, z_dims=[64], max_iter=30, batch_size=128,
                   learning_rate=0.001, seed=SEED, verbose=False)
    narre_kw = dict(embedding_size=32, id_embedding_size=8,
                    n_factors=8, attention_size=8, kernel_sizes=[3],
                    n_filters=16, dropout_rate=0.5, max_text_length=50,
                    max_num_review=8, batch_size=64, max_iter=2,
                    seed=SEED, verbose=False)
    hrdr_kw = dict(embedding_size=32, id_embedding_size=8,
                   n_factors=8, attention_size=8, kernel_sizes=[3],
                   n_filters=16, n_user_mlp_factors=16,
                   n_item_mlp_factors=16, dropout_rate=0.5,
                   max_text_length=50, max_num_review=8, batch_size=64,
                   max_iter=2, seed=SEED, verbose=False)
    return {
        # (kwargs, needs) — same kwargs on both sides
        "WMF": (wmf_kw, set()),
        "CDL": (cdl_kw, {"text"}),
        "PCRL": (pcrl_kw, {"graph"}),
        "NARRE": (narre_kw, {"reviews"}),
        "HRDR": (hrdr_kw, {"reviews"}),
    }


def run_side(side, name, data, scale_key, warm=False):
    kw_model, needs = model_specs()[name]
    n_items = SCALES[scale_key]["n_items"]

    if side == "ref":
        if name == "PCRL":
            # the reference's pcrl.py is TF1-only (bare ``tf.Session()``);
            # run it under the standard v1 compatibility shim
            import tensorflow.compat.v1 as tf1

            tf1.disable_v2_behavior()
            sys.modules["tensorflow"] = tf1
            # and its scipy usage predates 1.14 (``.A`` was removed)
            import scipy.sparse as sp

            for cls_ in (sp.csr_matrix, sp.csc_matrix, sp.coo_matrix):
                if not hasattr(cls_, "A"):
                    cls_.A = property(lambda self: self.toarray())
        from ref_loader import load_ref_tf_models

        root = load_ref_tf_models()
        M, EM, metrics_ns = root.models, root.eval_methods, root.metrics
        import refcornac.data as D
    else:
        _enable_compile_cache()
        import cornac_tpu as ct

        M, EM, metrics_ns = ct.models, ct.eval_methods, ct.metrics
        import cornac_tpu.data as D

    split_kw = {}
    if "text" in needs:
        docs, ids = text_corpus(n_items)
        split_kw["item_text"] = D.TextModality(
            corpus=docs, ids=ids, max_vocab=200
        )
    if "graph" in needs:
        split_kw["item_graph"] = D.GraphModality(data=item_graph_edges(n_items))
    if "reviews" in needs:
        docs, _ = text_corpus(n_items, seed=101)
        reviews = [(u, i, docs[int(i[1:]) % len(docs)]) for u, i, _ in data]
        split_kw["review_text"] = D.ReviewModality(
            data=reviews, tokenizer=None, max_vocab=200
        )

    split = EM.RatioSplit(
        data=data, test_size=0.2, rating_threshold=3.5, seed=SEED,
        exclude_unknowns=True, verbose=False, **split_kw,
    )
    metrics = [
        metrics_ns.AUC(),
        metrics_ns.Recall(k=100),
        metrics_ns.Recall(k=20),
        metrics_ns.NDCG(k=10),
    ]

    # drop kwargs a side's constructor doesn't take (e.g. the reference's
    # PCRL has no ``seed``) so one spec serves both sides
    import inspect

    cls = getattr(M, name)
    sig = inspect.signature(cls.__init__)
    if not any(
        p.kind == p.VAR_KEYWORD for p in sig.parameters.values()
    ):
        kw_model = {k: v for k, v in kw_model.items() if k in sig.parameters}

    walls = []
    for _ in range(2 if warm else 1):
        model = cls(**kw_model)
        t0 = time.perf_counter()
        test_result, _ = split.evaluate(
            model=model, metrics=metrics, user_based=True,
            show_validation=False,
        )
        walls.append(time.perf_counter() - t0)
    out = {k: float(v) for k, v in test_result.metric_avg_results.items()}
    out["wall_s"] = walls[-1]
    if warm:
        out["wall_cold_s"] = walls[0]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="100k", choices=list(SCALES))
    ap.add_argument("--models", default="WMF,CDL,PCRL")
    ap.add_argument("--sides", default="ref,ours")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument(
        "--outdir", default=os.path.join(os.path.dirname(__file__), "parity")
    )
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    data = gen_data(**SCALES[args.scale])
    print(f"[data] {args.scale}: {len(data)} obs", file=sys.stderr, flush=True)

    for name in args.models.split(","):
        results = {}
        for side in args.sides.split(","):
            print(f"[{name}] {side} ...", file=sys.stderr, flush=True)
            try:
                results[side] = run_side(
                    side, name, data, args.scale,
                    warm=(args.warm and side == "ours"),
                )
            except Exception as e:  # record the failure, keep racing
                results[side] = {"error": f"{type(e).__name__}: {e}"}
            print(f"[{name}] {side}: {results[side]}", file=sys.stderr, flush=True)
        path = os.path.join(args.outdir, f"tf_{args.scale}_{name}.json")
        with open(path, "w") as f:
            json.dump({"model": name, "scale": args.scale, **results}, f, indent=1)
        print(f"[{name}] wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

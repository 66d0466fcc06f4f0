"""Examples suite: every script compiles; the offline ones (no dataset
download) run end-to-end.

Mirrors the reference's CI strategy of smoke-running examples
(reference ``.github/workflows/python-package.yml`` runs
``examples/first_example.py``); since this environment has no network
egress, the network-free examples stand in for it.
"""

import glob
import os
import py_compile
import runpy

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
ALL_EXAMPLES = sorted(glob.glob(os.path.join(EXAMPLES_DIR, "*.py")))

# Examples that run without any dataset download.
OFFLINE = [
    "offline_quickstart.py",
    "given_data.py",
    "vebpr_example.py",
    "multichip_sharding.py",
    "seq_objectives_offline.py",
]


def test_examples_exist():
    assert len(ALL_EXAMPLES) >= 60


@pytest.mark.parametrize("path", ALL_EXAMPLES, ids=os.path.basename)
def test_example_compiles(path):
    py_compile.compile(path, doraise=True)


@pytest.mark.parametrize("name", OFFLINE)
def test_offline_example_runs(name, capsys, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # any artifacts land in tmp
    runpy.run_path(os.path.join(EXAMPLES_DIR, name), run_name="__main__")


# --------------------------------------------------------------------- #
# dataset-backed examples, run end-to-end on synthetic fixtures
# (no network egress: every loader is patched with format-identical
# synthetic data, so the example scripts execute unmodified)
# --------------------------------------------------------------------- #
def _synth_uir(n_users=60, n_items=100, n=2500, seed=0, fmt="UIR", binary=False):
    import numpy as np

    rng = np.random.RandomState(seed)
    seen = set()
    out = []
    while len(out) < n:
        u, i = rng.randint(n_users), rng.randint(n_items)
        if (u, i) in seen:
            continue
        seen.add((u, i))
        r = 1.0 if binary else float(rng.randint(1, 6))
        row = (f"u{u}", f"i{i}", r)
        if fmt == "UIRT":
            row = row + (int(1000 + len(out)),)
        out.append(row)
    return out


def _synth_text(n_items=100, seed=1):
    """Zipf-ish 300-word vocabulary so TextModality's min_freq/max_doc_freq
    pruning (examples use the reference's settings) keeps a real lexicon."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(seed)
    # letter-only words: the tokenizer strips digits/punctuation
    syll = ["ba", "ce", "di", "fo", "gu", "ka", "le", "mi", "no", "pu"]
    vocab = np.array(
        ["".join(w) for w in itertools.product(syll, syll, syll)][:300]
    )
    p = 1.0 / np.arange(1, 301)
    p /= p.sum()
    return (
        [" ".join(rng.choice(vocab, size=40, p=p)) for _ in range(n_items)],
        [f"i{i}" for i in range(n_items)],
    )


def _synth_visual(n_items=100, dim=32, seed=2):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_items, dim)).astype("float32"), [
        f"i{i}" for i in range(n_items)
    ]


def _synth_graph(n=100, prefix="i", seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        (f"{prefix}{rng.randint(n)}", f"{prefix}{rng.randint(n)}", 1.0)
        for _ in range(250)
    ]


def _synth_sentiment(seed=4):
    import numpy as np

    rng = np.random.RandomState(seed)
    out = []
    for u, i, r in _synth_uir(n=1200, seed=seed):
        asp = rng.choice(["price", "quality", "size"])
        op = rng.choice(["good", "bad", "fine"])
        out.append((u, i, [(asp, op, 1.0 if r >= 3 else -1.0)]))
    return out


def _synth_review(seed=5):
    texts, _ = _synth_text(seed=seed)
    return [(u, i, texts[int(i[1:])]) for u, i, _ in _synth_uir(n=1200, seed=seed)]


def _synth_usit(n_sessions=80, n_items=40, seed=6, with_user=True):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for s in range(n_sessions):
        u = f"u{rng.randint(20)}"
        x = rng.randint(n_items)
        for _ in range(rng.randint(3, 8)):
            row = (u, str(s), f"i{x}", t) if with_user else (str(s), f"i{x}", t)
            rows.append(row)
            t += 1
            x = (x + 1) % n_items if rng.rand() < 0.8 else rng.randint(n_items)
    return rows


def _synth_sitjson(n_sessions=60, n_items=40, seed=7):
    return [
        (s, i, t, {}) for (s, i, t) in _synth_usit(n_sessions, n_items, seed, False)
    ]


def _synth_basket(seed=8):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows, t = [], 0
    for b in range(150):
        u = f"u{rng.randint(30)}"
        for _ in range(rng.randint(2, 6)):
            rows.append((u, str(b), f"i{rng.randint(60)}", t, {}))
        t += 1
    return rows


@pytest.fixture()
def synthetic_datasets(monkeypatch):
    """Patch every dataset loader the examples use with synthetic data."""
    from cornac_tpu.datasets import (
        amazon_clothing, amazon_digital_music, amazon_office, amazon_toy,
        citeulike, diginetica, epinions, filmtrust, movielens, netflix,
        tafeng, tradesy, yoochoose,
    )

    def feedback(seed, binary=False):
        return lambda *a, fmt="UIR", **k: _synth_uir(
            seed=seed, fmt=fmt if fmt in ("UIR", "UIRT") else "UIR", binary=binary
        )

    monkeypatch.setattr(movielens, "load_feedback", feedback(10))
    monkeypatch.setattr(movielens, "load_plot", lambda *a, **k: _synth_text(seed=11))
    monkeypatch.setattr(netflix, "load_feedback", feedback(12, binary=True))
    monkeypatch.setattr(citeulike, "load_feedback", feedback(13, binary=True))
    monkeypatch.setattr(citeulike, "load_text", lambda *a, **k: _synth_text(seed=14))
    monkeypatch.setattr(amazon_toy, "load_feedback", feedback(15))
    monkeypatch.setattr(
        amazon_toy, "load_sentiment", lambda *a, **k: _synth_sentiment(15)
    )
    monkeypatch.setattr(amazon_clothing, "load_feedback", feedback(16, binary=True))
    monkeypatch.setattr(
        amazon_clothing, "load_visual_feature", lambda *a, **k: _synth_visual(seed=16)
    )
    monkeypatch.setattr(
        amazon_clothing, "load_text", lambda *a, **k: _synth_text(seed=16)
    )
    monkeypatch.setattr(
        amazon_clothing, "load_graph", lambda *a, **k: _synth_graph(seed=16)
    )
    monkeypatch.setattr(amazon_office, "load_feedback", feedback(17))
    monkeypatch.setattr(
        amazon_office, "load_graph", lambda *a, **k: _synth_graph(seed=17)
    )
    monkeypatch.setattr(amazon_digital_music, "load_feedback", feedback(18))
    monkeypatch.setattr(
        amazon_digital_music, "load_review", lambda *a, **k: _synth_review(18)
    )
    monkeypatch.setattr(tradesy, "load_feedback", feedback(19, binary=True))
    monkeypatch.setattr(
        tradesy, "load_visual_feature", lambda *a, **k: _synth_visual(seed=19)
    )
    monkeypatch.setattr(filmtrust, "load_feedback", feedback(20))
    monkeypatch.setattr(
        filmtrust, "load_trust", lambda *a, **k: _synth_graph(60, "u", 20)
    )
    monkeypatch.setattr(epinions, "load_feedback", feedback(21, binary=True))
    monkeypatch.setattr(
        epinions, "load_trust", lambda *a, **k: _synth_graph(60, "u", 21)
    )
    monkeypatch.setattr(
        diginetica, "load_train", lambda *a, **k: _synth_usit(seed=22)
    )
    monkeypatch.setattr(
        diginetica, "load_test", lambda *a, **k: _synth_usit(20, seed=23)
    )
    monkeypatch.setattr(
        yoochoose, "load_buy", lambda *a, **k: _synth_sitjson(seed=24)
    )
    monkeypatch.setattr(
        yoochoose, "load_test", lambda *a, **k: _synth_sitjson(15, seed=25)
    )
    monkeypatch.setattr(tafeng, "load_basket", lambda *a, **k: _synth_basket(26))


# dataset-backed examples that run end-to-end on the synthetic fixtures;
# the remaining scripts are still compile-checked above (their model
# families are all exercised by tests/test_quality_goldens.py)
DATASET_EXAMPLES = [
    "bpr_netflix.py",
    "ease_movielens.py",
    "ann_example.py",
    "hpf_movielens.py",
    "knn_movielens.py",
    "skm_movielens.py",
    "sansa_movielens.py",
    "sansa_tradesy.py",
    "biased_mf.py",
    "pmf_ratio.py",
    "svd_example.py",
    "nmf_example.py",
    "wmf_example.py",
    "mmmf_exp.py",
    "ibpr_example.py",
    "fm_example.py",
    "baseline_only_example.py",
    "vaecf_citeulike.py",
    "ctr_example_citeulike.py",
    "cdl_example.py",
    "cdr_example.py",
    "cvae_example.py",
    "conv_mf_example.py",
    "hft_example.py",
    "efm_example.py",
    "lrppm_example.py",
    "mter_example.py",
    "trirank_example.py",
    "mcf_office.py",
    "c2pf_example.py",
    "pcrl_example.py",
    "sorec_filmtrust.py",
    "cvaecf_filmtrust.py",
    "sbpr_epinions.py",
    "vbpr_tradesy.py",
    "amr_clothing.py",
    "causalrec_clothing.py",
    "vmf_clothing.py",
    "fpmc_diginetica.py",
    "spop_yoochoose.py",
    "gru4rec_yoochoose.py",
    "gp_top_tafeng.py",
    "tifuknn_tafeng.py",
    "upcf_tafeng.py",
    "cross_validation_example.py",
    "propensity_stratified_evaluation_example.py",
    "timestamp_split_example.py",
    "param_search.py",
    "ncf_example.py",
    "lightgcn_example.py",
    "ngcf_example.py",
    "gcmc_example.py",
    "recvae_example.py",
    "bivaecf_example.py",
]


@pytest.mark.parametrize("name", DATASET_EXAMPLES)
def test_dataset_example_runs_on_synthetic(
    name, synthetic_datasets, capsys, monkeypatch, tmp_path
):
    monkeypatch.chdir(tmp_path)
    runpy.run_path(os.path.join(EXAMPLES_DIR, name), run_name="__main__")

"""Learning-quality gates beyond finiteness: representative models must
beat chance on signal-bearing data (keeps kernels honest the way the
reference's example outputs do)."""

import numpy as np
import pytest

from cornac_tpu.eval_methods import RatioSplit


def _structured_implicit(seed=3, n_users=40, n_items=60, n=1200):
    """Two-block preference structure: users prefer their own item block."""
    rng = np.random.RandomState(seed)
    data = set()
    while len(data) < n:
        u = rng.randint(n_users)
        block = (u % 2) * (n_items // 2)
        if rng.rand() < 0.8:
            i = block + rng.randint(n_items // 2)
        else:
            i = rng.randint(n_items)
        data.add((f"u{u}", f"i{i}"))
    # sorted: set order is PYTHONHASHSEED-dependent (split would drift)
    return [(u, i, 5.0) for u, i in sorted(data)]


@pytest.fixture(scope="module")
def implicit_split():
    return RatioSplit(
        data=_structured_implicit(), test_size=0.2, rating_threshold=1.0,
        seed=7,
    )


def _train_auc(model, rs):
    """In-block discrimination on train pairs vs cross-block items."""
    u, i, _ = rs.train_set.uir_tuple
    scores = model.score_batch(np.arange(rs.train_set.num_users))
    n_items = rs.train_set.num_items
    auc = []
    for uu in range(rs.train_set.num_users):
        own = np.flatnonzero(rs.train_set.csr_matrix.getrow(uu).toarray()[0])
        if len(own) == 0:
            continue
        rest = np.setdiff1d(np.arange(n_items), own)
        s = scores[uu]
        auc.append((s[own][:, None] > s[rest][None, :]).mean())
    return float(np.mean(auc))


@pytest.mark.parametrize(
    "make",
    [
        lambda: __import__("cornac_tpu.models", fromlist=["WMF"]).WMF(
            k=8, max_iter=10, seed=1, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["VAECF"]).VAECF(
            k=8, autoencoder_structure=[16], n_epochs=150, batch_size=16,
            learning_rate=0.01, seed=1),
        lambda: __import__("cornac_tpu.models", fromlist=["LightGCN"]).LightGCN(
            emb_size=16, num_epochs=60, num_layers=2, learning_rate=0.05,
            batch_size=64, seed=1, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["EASE"]).EASE(
            lamb=5.0, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["NeuMF"]).NeuMF(
            num_factors=8, layers=(16, 8), num_epochs=40, batch_size=64,
            lr=0.01, num_neg=3, seed=1, verbose=False),
        lambda: __import__("cornac_tpu.models", fromlist=["HPF"]).HPF(
            k=8, max_iter=60, seed=1),
    ],
    ids=["WMF", "VAECF", "LightGCN", "EASE", "NeuMF", "HPF"],
)
def test_model_learns_block_structure(implicit_split, make):
    m = make().fit(implicit_split.train_set)
    auc = _train_auc(m, implicit_split)
    assert auc > 0.75, f"{m.name} train AUC {auc:.3f} <= 0.75"

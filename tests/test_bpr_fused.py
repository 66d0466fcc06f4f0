"""The gather-eliminated BPR epoch program (packed positives + fused
factor/membership fetch) must be numerically identical to the general
form — same sampled triplets, same rejections, same updates. Exact on the
CPU backend (the one-hot matmul fetch moves each value untouched)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp


def _small_problem(seed=0, n_users=23, n_items=37, n=300, k=5):
    rng = np.random.RandomState(seed)
    rid = rng.randint(0, n_users, n).astype(np.int32)
    cid = rng.randint(0, n_items, n).astype(np.int32)
    csr = sp.csr_matrix(
        (np.ones(n, np.float32), (rid, cid)), shape=(n_users, n_items)
    )
    csr.sum_duplicates()
    U = rng.normal(0, 0.1, (n_users, k)).astype(np.float32)
    V = rng.normal(0, 0.1, (n_items, k)).astype(np.float32)
    Bi = np.zeros(n_items, np.float32)
    return rid, cid, csr, U, V, Bi


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize("variant", ["bpr", "hinge"])
def test_fused_epochs_match_general_form(use_bias, variant):
    import jax

    from cornac_tpu.models.bpr import _bpr_epochs, _membership_halfwords
    from cornac_tpu.ops.membership import build_membership

    rid, cid, csr, U, V, Bi = _small_problem()
    n_users, n_items = csr.shape
    membership = build_membership(csr)
    key = jax.random.PRNGKey(42)

    pairs = jnp.asarray(np.stack([rid, cid], axis=1), jnp.int32)

    def run(W16):
        return _bpr_epochs(
            jnp.asarray(U.copy()),
            jnp.asarray(V.copy()),
            jnp.asarray(Bi.copy()),
            key,
            pairs,
            membership,
            None,
            jnp.float32(0.05),
            jnp.float32(0.01),
            batch_size=64,
            use_bias=use_bias,
            num_items=n_items,
            n_epochs=3,
            epoch_offset=0,
            variant=variant,
            W16=W16,
        )

    legacy = run(None)

    n_words = (n_items + 15) // 16
    W16 = jnp.asarray(_membership_halfwords(csr, n_words))
    fused = run(W16)

    # identical sampling + identical rejections: the integer counters are
    # exact; factors agree to float precision (the two program shapes let
    # XLA reassociate fused reductions differently, so bit-exactness
    # across programs is not a sane contract — determinism within each is)
    for a, b, name in zip(legacy[3:], fused[3:], ("correct", "skipped")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{name} mismatch"
        )
    for a, b, name in zip(legacy[:3], fused[:3], ("U", "V", "Bi")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=f"{name} mismatch",
        )


def test_fit_uses_fused_path_and_learns():
    """End-to-end: the public fit at golden shape goes through the fused
    program (gates pass at 40x60) and still hits the quality floor."""
    import golden_models as G

    v = G.measure("BPR")
    assert v >= 0.87

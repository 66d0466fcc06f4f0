"""CVAECF — conditional VAE for CF: user preferences conditioned on the
social trust network, on FilmTrust.

Capability parity with reference ``examples/cvaecf_filmtrust.py`` (which
conditions on user text; here the auxiliary view is the trust graph turned
into per-user documents of trusted-friend ids).
"""

import cornac_tpu as ct
from cornac_tpu.data import TextModality
from cornac_tpu.datasets import filmtrust
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import NDCG, Recall
from cornac_tpu.models import CVAECF

ratings = filmtrust.load_feedback()
trust = filmtrust.load_trust()

# One "document" per user: the ids of users they trust.
user_docs = {}
for truster, trustee, _ in trust:
    user_docs.setdefault(truster, []).append(f"friend_{trustee}")
ids = list(user_docs.keys())
corpus = [" ".join(tokens) for tokens in user_docs.values()]

rs = RatioSplit(
    data=ratings, test_size=0.2, rating_threshold=3.0,
    exclude_unknowns=True, verbose=True, seed=123,
    user_text=TextModality(corpus=corpus, ids=ids, max_vocab=5000),
)

cvaecf = CVAECF(z_dim=20, h_dim=20, n_epochs=100, seed=123, verbose=True)

ct.Experiment(eval_method=rs, models=[cvaecf], metrics=[NDCG(k=50), Recall(k=50)]).run()

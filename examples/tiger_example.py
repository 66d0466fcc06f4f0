"""TIGER — generative retrieval with RQ-VAE semantic IDs and a T5-style
encoder-decoder, on MovieLens 100K with TF-IDF plot features providing the
item content the RQ-VAE tokenizes.

Capability parity with reference ``examples/tiger_example.py``.
"""

import numpy as np

import cornac_tpu as ct
from cornac_tpu.data import FeatureModality
from cornac_tpu.data.text import BaseTokenizer, TfidfVectorizer
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import NextItemEvaluation
from cornac_tpu.metrics import HitRatio, NDCG
from cornac_tpu.models import TIGER

ml_100k = movielens.load_feedback(fmt="UIRT", variant="100K")
plots, movie_ids = movielens.load_plot()

# Dense content features per item: TF-IDF of the plot, SVD-free (TIGER's
# RQ-VAE handles the dimensionality).
vectorizer = TfidfVectorizer(
    tokenizer=BaseTokenizer(stop_words="english"), max_features=512
)
tfidf = np.asarray(vectorizer.fit_transform(plots).todense(), dtype=np.float32)
item_feature = FeatureModality(features=tfidf, ids=movie_ids)

# Each user's chronological ratings form one session; last item is test.
nie = NextItemEvaluation.leave_last_out(
    ml_100k, fmt="UIRT", seed=123, verbose=True, item_feature=item_feature
)

tiger = TIGER(
    tokenizer="rqvae", rqvae_num_levels=3, rqvae_codebook_size=256,
    d_model=128, d_ff=1024, seed=123, verbose=True,
)

ct.Experiment(
    eval_method=nie, models=[tiger],
    metrics=[HitRatio(k=10), NDCG(k=10)],
).run()

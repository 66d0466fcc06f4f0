"""Model serving: save a trained model, then serve /recommend, /feedback
and /evaluate over HTTP. Works with Flask when installed, or with the
bundled stdlib-only standalone server.

Run:
    python examples/serving_example.py   # trains + saves the model
    MODEL_PATH=save_dir/BPR MODEL_CLASS=cornac_tpu.models.BPR \
        python -m cornac_tpu.serving.standalone --port 8080
    curl 'http://localhost:8080/recommend?uid=1&k=5'
"""

import cornac_tpu as ct
from cornac_tpu.datasets import movielens
from cornac_tpu.eval_methods import RatioSplit
from cornac_tpu.metrics import AUC
from cornac_tpu.models import BPR

ml_100k = movielens.load_feedback(variant="100K")
rs = RatioSplit(data=ml_100k, test_size=0.2, rating_threshold=4.0, seed=123)

bpr = BPR(k=10, max_iter=200, seed=123)

ct.Experiment(
    eval_method=rs, models=[bpr], metrics=[AUC()],
    save_dir="save_dir",
).run()

print("Model saved under save_dir/BPR — start the server as shown above.")

"""Assemble an importable ``refcornac`` package from the reference checkout
for behavioral parity tests.

Loads only the pure-Python layers (utils.common, data, metrics,
experiment.result, eval_methods.base_method/ratio_split) with the two
Cython touchpoints stubbed by numpy equivalents. The reference package
``__init__`` files are NOT executed (they pull compiled model extensions);
synthetic parent packages expose just what the leaf modules import.
Test-only helper.
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference/cornac"


def available():
    return os.path.isdir(REF)


def _synthetic_pkg(name):
    mod = types.ModuleType(name)
    mod.__package__ = name
    mod.__path__ = []  # mark as package
    sys.modules[name] = mod
    return mod


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub_fast_sparse_funcs():
    """numpy stand-ins for the reference's Cython CSR normalizers."""
    mod = types.ModuleType("refcornac.utils.fast_sparse_funcs")

    def inplace_csr_row_normalize_l1(X):
        sums = np.abs(X).sum(axis=1).A1
        sums[sums == 0] = 1.0
        X.data /= np.repeat(sums, np.diff(X.indptr))

    def inplace_csr_row_normalize_l2(X):
        sq = X.multiply(X).sum(axis=1).A1
        norms = np.sqrt(sq)
        norms[norms == 0] = 1.0
        X.data /= np.repeat(norms, np.diff(X.indptr))

    mod.inplace_csr_row_normalize_l1 = inplace_csr_row_normalize_l1
    mod.inplace_csr_row_normalize_l2 = inplace_csr_row_normalize_l2
    sys.modules[mod.__name__] = mod
    return mod


def load_refcornac():
    """Returns the assembled ``refcornac`` namespace (cached)."""
    if "refcornac" in sys.modules:
        return sys.modules["refcornac"]

    root = _synthetic_pkg("refcornac")

    # utils
    utils = _synthetic_pkg("refcornac.utils")
    _stub_fast_sparse_funcs()
    common = _load("refcornac.utils.common", os.path.join(REF, "utils/common.py"))
    for fn in (
        "get_rng",
        "estimate_batches",
        "validate_format",
        "normalize",
        "safe_indexing",
        "intersects",
        "excepts",
    ):
        setattr(utils, fn, getattr(common, fn))
    utils.common = common
    root.utils = utils

    # data (order matters: text imports `from . import FeatureModality`)
    data = _synthetic_pkg("refcornac.data")
    modality = _load("refcornac.data.modality", os.path.join(REF, "data/modality.py"))
    data.Modality = modality.Modality
    data.FeatureModality = modality.FeatureModality
    text = _load("refcornac.data.text", os.path.join(REF, "data/text.py"))
    data.TextModality = text.TextModality
    data.ReviewModality = text.ReviewModality
    image = _load("refcornac.data.image", os.path.join(REF, "data/image.py"))
    data.ImageModality = image.ImageModality
    graph = _load("refcornac.data.graph", os.path.join(REF, "data/graph.py"))
    data.GraphModality = graph.GraphModality
    sentiment = _load(
        "refcornac.data.sentiment", os.path.join(REF, "data/sentiment.py")
    )
    data.SentimentModality = sentiment.SentimentModality
    reader = _load("refcornac.data.reader", os.path.join(REF, "data/reader.py"))
    data.Reader = reader.Reader
    dataset = _load("refcornac.data.dataset", os.path.join(REF, "data/dataset.py"))
    for cls in (
        "Dataset",
        "BasketDataset",
        "SequentialDataset",
        "PurchaseViewDataset",
    ):
        setattr(data, cls, getattr(dataset, cls))
    root.data = data

    # metrics
    metrics = _synthetic_pkg("refcornac.metrics")
    rating = _load("refcornac.metrics.rating", os.path.join(REF, "metrics/rating.py"))
    ranking = _load(
        "refcornac.metrics.ranking", os.path.join(REF, "metrics/ranking.py")
    )
    for mod in (rating, ranking):
        for n in dir(mod):
            if n[0].isupper():
                setattr(metrics, n, getattr(mod, n))
    root.metrics = metrics

    # experiment.result
    experiment = _synthetic_pkg("refcornac.experiment")
    result = _load(
        "refcornac.experiment.result", os.path.join(REF, "experiment/result.py")
    )
    experiment.result = result
    root.experiment = experiment

    # exception + init utils (model deps)
    exception = _load("refcornac.exception", os.path.join(REF, "exception.py"))
    root.exception = exception
    init_utils = _load(
        "refcornac.utils.init_utils", os.path.join(REF, "utils/init_utils.py")
    )
    utils.init_utils = init_utils

    # numpy-pure model zoo members (for behavioral parity tests)
    models = _synthetic_pkg("refcornac.models")
    recommender = _load(
        "refcornac.models.recommender", os.path.join(REF, "models/recommender.py")
    )
    models.recommender = recommender
    for attr in ("Recommender", "NextBasketRecommender", "NextItemRecommender"):
        setattr(models, attr, getattr(recommender, attr))
    for mod_name, file_rel, classes in [
        ("ease", "models/ease/recom_ease.py", ["EASE"]),
        ("most_pop", "models/most_pop/recom_most_pop.py", ["MostPop"]),
        ("global_avg", "models/global_avg/recom_global_avg.py", ["GlobalAvg"]),
        ("spop", "models/spop/recom_spop.py", ["SPop"]),
        ("gp_top", "models/gp_top/recom_gp_top.py", ["GPTop"]),
        ("tifuknn", "models/tifuknn/recom_tifuknn.py", ["TIFUKNN"]),
        ("upcf", "models/upcf/recom_upcf.py", ["UPCF"]),
    ]:
        # loaded as refcornac.models.<sub>.impl so `from ..recommender`
        # and `from ...exception` resolve at the real package depth
        _synthetic_pkg("refcornac.models." + mod_name)
        mod = _load(
            "refcornac.models." + mod_name + ".impl", os.path.join(REF, file_rel)
        )
        for cls in classes:
            setattr(models, cls, getattr(mod, cls))
    root.models = models

    # eval methods
    eval_methods = _synthetic_pkg("refcornac.eval_methods")
    base_method = _load(
        "refcornac.eval_methods.base_method",
        os.path.join(REF, "eval_methods/base_method.py"),
    )
    eval_methods.base_method = base_method
    eval_methods.BaseMethod = base_method.BaseMethod
    # free functions some reference models import for validation tracking
    eval_methods.ranking_eval = base_method.ranking_eval
    eval_methods.rating_eval = base_method.rating_eval
    ratio_split = _load(
        "refcornac.eval_methods.ratio_split",
        os.path.join(REF, "eval_methods/ratio_split.py"),
    )
    eval_methods.RatioSplit = ratio_split.RatioSplit
    for mod_name, cls in (
        ("stratified_split", "StratifiedSplit"),
        ("timestamp_split", "TimestampSplit"),
        ("cross_validation", "CrossValidation"),
    ):
        mod = _load(
            "refcornac.eval_methods." + mod_name,
            os.path.join(REF, f"eval_methods/{mod_name}.py"),
        )
        setattr(eval_methods, cls, getattr(mod, cls))
    root.eval_methods = eval_methods

    return root


def _load_pkg(name, dirpath):
    """Load a real reference package (executing its ``__init__``) under the
    refcornac namespace, with submodule search rooted at the real directory
    so lazy relative imports (``from .backend_pt import ...``) resolve."""
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(dirpath, "__init__.py"),
        submodule_search_locations=[dirpath],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _real_pkg_no_init(name, dirpath):
    """Register a package pointing at a real directory WITHOUT executing its
    ``__init__`` (reference model ``__init__`` files import compiled ext
    siblings)."""
    mod = types.ModuleType(name)
    mod.__package__ = name
    mod.__path__ = [dirpath]
    sys.modules[name] = mod
    return mod


#: torch-backed reference families runnable without any Cython build:
#: refcornac.models attr -> (package dir, recom module, class name)
TORCH_MODELS = {
    "MF": ("mf", "recom_mf", "MF"),  # construct with backend="pytorch"
    "VAECF": ("vaecf", "recom_vaecf", "VAECF"),
    "RecVAE": ("recvae", "recom_recvae", "RecVAE"),
    "BiVAECF": ("bivaecf", "recom_bivaecf", "BiVAECF"),
    "GMF": ("ncf", "recom_gmf", "GMF"),
    "MLP": ("ncf", "recom_mlp", "MLP"),
    "NeuMF": ("ncf", "recom_neumf", "NeuMF"),
    "VBPR": ("vbpr", "recom_vbpr", "VBPR"),
    "GRU4Rec": ("gru4rec", "recom_gru4rec", "GRU4Rec"),
    "SASRec": ("sasrec", "recom_sasrec", "SASRec"),
}

#: transformer_rec family (loaded after TORCH_MODELS; TransformerRec first
#: since BERT4Rec subclasses it)
TRANSFORMER_MODELS = [
    ("TransformerRec", "transformer_rec", "recom_transformer_rec", "TransformerRec"),
    ("BERT4Rec", "bert4rec", "recom_bert4rec", "BERT4Rec"),
]


def load_ref_torch_models():
    """Extend ``refcornac`` with the reference's torch-backed model zoo.

    Returns the refcornac root with ``root.models.<Name>`` populated for
    every entry in :data:`TORCH_MODELS`. Only the Cython ``fast_dot`` is
    stubbed (numpy ``output += mat @ vec``); the torch training/scoring code
    runs unmodified. Also aliases ``cornac`` -> ``refcornac`` in sys.modules
    because gru4rec/sasrec use absolute imports.
    """
    root = load_refcornac()
    models = root.models
    if getattr(models, "_torch_loaded", False):
        return root

    def fast_dot(vec, mat, output):
        output += np.asarray(mat) @ np.asarray(vec)

    root.utils.fast_dot = fast_dot

    # absolute-import aliases used by the reference's seq model files
    sys.modules.setdefault("cornac", root)
    sys.modules.setdefault("cornac.models", models)
    sys.modules.setdefault("cornac.models.recommender", models.recommender)

    _load_pkg("refcornac.models.seq_utils", os.path.join(REF, "models/seq_utils"))

    for attr, (pkg, recom_mod, cls) in TORCH_MODELS.items():
        pkg_name = "refcornac.models." + pkg
        if pkg_name not in sys.modules:
            _real_pkg_no_init(pkg_name, os.path.join(REF, "models", pkg))
        mod = importlib.import_module(pkg_name + "." + recom_mod)
        setattr(models, attr, getattr(mod, cls))

    # transformer family: bert4rec does `from ..transformer_rec import
    # TransformerRec`, which needs the real package __init__ executed
    try:
        for attr, pkg, recom_mod, cls in TRANSFORMER_MODELS:
            pkg_name = "refcornac.models." + pkg
            if pkg_name not in sys.modules:
                _load_pkg(pkg_name, os.path.join(REF, "models", pkg))
            setattr(models, attr, getattr(sys.modules[pkg_name], cls))
    except Exception:  # transformer extras are best-effort
        pass

    models._torch_loaded = True
    return root


#: tensorflow-backed reference families (tf.compat.v1 graph sessions for
#: WMF/CDL/Beacon, TF2 keras for NARRE/HRDR): attr -> (pkg, module, class)
TF_MODELS = {
    "WMF": ("wmf", "recom_wmf", "WMF"),
    "CDL": ("cdl", "recom_cdl", "CDL"),
    "NARRE": ("narre", "recom_narre", "NARRE"),
    "HRDR": ("hrdr", "recom_hrdr", "HRDR"),
    "Beacon": ("beacon", "recom_beacon", "Beacon"),
    "PCRL": ("pcrl", "recom_pcrl", "PCRL"),
}


def load_ref_tf_models():
    """Extend ``refcornac`` with the reference's TensorFlow-backed model
    zoo (TF 2.x with compat.v1 is importable in this image). The TF
    training/scoring code runs unmodified. Returns the refcornac root."""
    root = load_ref_torch_models()
    models = root.models
    if getattr(models, "_tf_loaded", False):
        return root
    for attr, (pkg, recom_mod, cls) in TF_MODELS.items():
        pkg_name = "refcornac.models." + pkg
        if pkg_name not in sys.modules:
            _real_pkg_no_init(pkg_name, os.path.join(REF, "models", pkg))
        mod = importlib.import_module(pkg_name + "." + recom_mod)
        setattr(models, attr, getattr(mod, cls))
    models._tf_loaded = True
    return root


def load_ref_next_item():
    """Extend ``refcornac`` with the reference's NextItemEvaluation (for
    sequential head-to-head runs). Returns the refcornac root."""
    root = load_ref_torch_models()
    em = root.eval_methods
    if hasattr(em, "NextItemEvaluation"):
        return root
    nie = _load(
        "refcornac.eval_methods.next_item_evaluation",
        os.path.join(REF, "eval_methods/next_item_evaluation.py"),
    )
    em.next_item_evaluation = nie
    em.NextItemEvaluation = nie.NextItemEvaluation
    return root


class RefDuckModel:
    """Deterministic stand-in implementing the reference Recommender
    surface the eval loops call (rank/rate/score), with the exact rank()
    semantics of reference ``models/recommender.py:476-530``."""

    def __init__(self, score_fn, num_users, num_items, total_items=None, rating_range=(1.0, 5.0)):
        self.score_fn = score_fn
        self.num_users = num_users
        self.num_items = num_items
        self.total_items = num_items if total_items is None else total_items
        self.lo, self.hi = rating_range

    def score(self, user_idx, item_idx=None):
        row = self.score_fn(user_idx, self.total_items)
        return row if item_idx is None else row[item_idx]

    def rate(self, user_idx, item_idx):
        return np.clip(self.score(user_idx, item_idx), self.lo, self.hi)

    def rank(self, user_idx, item_indices=None, k=-1, **kwargs):
        all_item_scores = self.score(user_idx)
        item_indices = (
            np.arange(self.num_items)
            if item_indices is None
            else np.asarray(item_indices)
        )
        item_scores = all_item_scores[item_indices]
        if k != -1:
            partitioned_idx = np.argpartition(item_scores, -k)
            top_k_idx = partitioned_idx[-k:]
            sorted_top_k_idx = top_k_idx[np.argsort(item_scores[top_k_idx])]
            partitioned_idx[-k:] = sorted_top_k_idx
            ranked_items = item_indices[partitioned_idx[::-1]]
        else:
            ranked_items = item_indices[item_scores.argsort()[::-1]]
        return ranked_items, item_scores


def load_ref_next_basket():
    """Extend ``refcornac`` with the reference's NextBasketEvaluation (for
    the Beacon head-to-head). Returns the refcornac root."""
    root = load_ref_tf_models()
    em = root.eval_methods
    if hasattr(em, "NextBasketEvaluation"):
        return root
    nbe = _load(
        "refcornac.eval_methods.next_basket_evaluation",
        os.path.join(REF, "eval_methods/next_basket_evaluation.py"),
    )
    em.next_basket_evaluation = nbe
    em.NextBasketEvaluation = nbe.NextBasketEvaluation
    return root

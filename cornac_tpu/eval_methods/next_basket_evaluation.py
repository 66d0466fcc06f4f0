"""Next-basket evaluation.

Capability parity with reference
``cornac/eval_methods/next_basket_evaluation.py:27-380``: user-based ratio
split over BasketDatasets, leave-last-basket protocol, and the
conventional / repetition / exploration result breakdowns. The hot loop
batches users through ``NextBasketRecommender.score_baskets_batch`` and
computes all three breakdowns from one score matrix per batch via the
vectorized metric engine.
"""

import time
from collections import OrderedDict

import numpy as np

from ..data import BasketDataset
from ..experiment.result import Result
from ..metrics import RankingContext
from ..models import NextBasketRecommender
from ..utils.common import safe_indexing
from .ratio_split import RatioSplit

# result-table breakdowns: every test basket / only repeated items /
# only first-seen items, keyed by the suffix they carry in the output
_BREAKDOWNS = ("conventional", "repetition", "exploration")
_SUFFIX = {"conventional": "", "repetition": "-rep", "exploration": "-expl"}


def ranking_eval(
    model,
    metrics,
    train_set,
    test_set,
    repetition_eval=False,
    exploration_eval=False,
    exclude_unknowns=True,
    verbose=False,
    batch_size=256,
):
    """Evaluate over test users' last baskets, given their history baskets."""
    if len(metrics) == 0:
        return [], []

    kinds = ["conventional"]
    if repetition_eval:
        kinds.append("repetition")
    if exploration_eval:
        kinds.append("exploration")
    avg_results = {kind: [] for kind in _BREAKDOWNS}
    user_results = {kind: [{} for _ in metrics] for kind in _BREAKDOWNS}

    n_items = train_set.num_items if exclude_unknowns else test_set.num_items

    # collect (user, history baskets, gt basket)
    tasks = []
    for [user_idx], [bids], [baskets] in test_set.ubi_iter(batch_size=1, shuffle=False):
        if len(baskets) < 2:
            continue
        history, gt = baskets[:-1], baskets[-1]
        if len(gt) == 0:
            continue
        tasks.append((int(user_idx), [list(b) for b in history], list(gt)))

    def _run(kind, select_fn):
        for start in range(0, len(tasks), batch_size):
            chunk = tasks[start : start + batch_size]
            users = np.asarray([t[0] for t in chunk])
            histories = [t[1] for t in chunk]

            scores = np.asarray(
                model.score_baskets_batch(users, histories), dtype=np.float64
            )
            if scores.shape[1] < n_items:
                fill = scores.min(axis=1, keepdims=True)
                expanded = np.broadcast_to(
                    fill, (scores.shape[0], n_items)
                ).copy()
                expanded[:, : scores.shape[1]] = scores
                scores = expanded
            else:
                scores = scores[:, :n_items]

            pos_mask = np.zeros((len(chunk), n_items), dtype=bool)
            for b, t in enumerate(chunk):
                sel = [i for i in select_fn(t) if i < n_items]
                pos_mask[b, sel] = True
            keep = pos_mask.any(axis=1)
            if not keep.any():
                continue
            cand_mask = np.ones_like(pos_mask)
            ctx = RankingContext(
                np.where(cand_mask, scores, -np.inf)[keep],
                pos_mask[keep],
                cand_mask[keep],
            )
            kept = np.flatnonzero(keep)
            for i, mt in enumerate(metrics):
                vals = mt.batch_compute(ctx)
                for local, v in zip(kept, vals):
                    user_results[kind][i][chunk[local][0]] = float(v)

    def seen_before(t):
        return {item for basket in t[1] for item in basket}

    def repeated_items(t):
        seen = seen_before(t)  # one history flatten per task, not per item
        return [i for i in t[2] if i in seen]

    def explored_items(t):
        seen = seen_before(t)
        return [i for i in t[2] if i not in seen]

    selectors = {
        "conventional": lambda t: t[2],
        "repetition": repeated_items,
        "exploration": explored_items,
    }
    for kind in kinds:
        _run(kind, selectors[kind])
        for per_user in user_results[kind]:
            avg_results[kind].append(
                float(np.mean(list(per_user.values()))) if per_user else 0
            )

    return avg_results, user_results


class NextBasketEvaluation(RatioSplit):
    """Split *users* into train/val/test; evaluate each test user's last
    basket given their earlier baskets."""

    def __init__(
        self,
        data=None,
        test_size=0.2,
        val_size=0.0,
        fmt="UBI",
        seed=None,
        repetition_eval=False,
        exploration_eval=False,
        exclude_unknowns=True,
        verbose=False,
        **kwargs,
    ):
        assert fmt.startswith("U")
        data_size = len(set(u for (u, *_rest) in data))  # split by users

        super().__init__(
            data=data,
            data_size=data_size,
            test_size=test_size,
            val_size=val_size,
            fmt=fmt,
            seed=seed,
            exclude_unknowns=exclude_unknowns,
            verbose=verbose,
            **kwargs,
        )
        self.repetition_eval = repetition_eval
        self.exploration_eval = exploration_eval

    def _split(self):
        # the split unit is the USER: shuffle the unique owners, carve the
        # shuffled list into train/val/test, then pull each owner's rows
        owners = np.asarray([row[0] for row in self.data])
        shuffled = np.unique(owners)
        self.rng.shuffle(shuffled)

        rows_of = lambda members: np.flatnonzero(np.isin(owners, members))
        cut = len(shuffled) - self.test_size
        if self.test_size == 0:
            # reference quirk (next_basket_evaluation.py test-user slice
            # [-0:]): zero test share means EVERY user lands in test and
            # the val share collapses to empty — preserved for parity
            test_members, val_members = shuffled, shuffled[:0]
        else:
            test_members = shuffled[cut:]
            val_members = shuffled[self.train_size : cut]
        val_rows = rows_of(val_members)
        self.build(
            train_data=safe_indexing(self.data, rows_of(shuffled[: self.train_size])),
            test_data=safe_indexing(self.data, rows_of(test_members)),
            val_data=safe_indexing(self.data, val_rows) if val_rows.size else None,
        )

    def _build_datasets(self, train_data, test_data, val_data=None):
        def as_baskets(rows, exclude_unknowns):
            return BasketDataset.build(
                data=rows, fmt=self.fmt, seed=self.seed,
                global_uid_map=self.global_uid_map,
                global_iid_map=self.global_iid_map,
                exclude_unknowns=exclude_unknowns,
            )

        # unknowns are only excluded from held-out sets (train defines them)
        self.train_set = as_baskets(train_data, False)
        self.test_set = as_baskets(test_data, self.exclude_unknowns)
        if val_data is not None and len(val_data) > 0:
            self.val_set = as_baskets(val_data, self.exclude_unknowns)

        built = [s for s in (self.train_set, self.test_set, self.val_set) if s]
        self.total_baskets = sum(s.num_baskets for s in built)
        if self.verbose:
            print(f"Total users = {self.total_users}")
            print(f"Total baskets = {self.total_baskets}")

    def _build_modalities(self):
        pass

    def _eval(self, model, test_set, ranking_metrics):
        metric_avg_results = OrderedDict()
        metric_user_results = OrderedDict()

        avg_results, user_results = ranking_eval(
            model=model,
            metrics=ranking_metrics,
            train_set=self.train_set,
            test_set=test_set,
            repetition_eval=self.repetition_eval,
            exploration_eval=self.exploration_eval,
            exclude_unknowns=self.exclude_unknowns,
            verbose=self.verbose,
        )

        active = [
            kind for kind in _BREAKDOWNS
            if kind == "conventional"
            or getattr(self, f"{kind}_eval", False)
        ]
        for kind in active:
            for i, mt in enumerate(ranking_metrics):
                column = mt.name + _SUFFIX[kind]
                metric_avg_results[column] = avg_results[kind][i]
                metric_user_results[column] = user_results[kind][i]

        return Result(model.name, metric_avg_results, metric_user_results)

    def evaluate(self, model, metrics, user_based, show_validation=True):
        if not isinstance(model, NextBasketRecommender):
            raise ValueError(
                "model must be a NextBasketRecommender but '%s' is provided"
                % type(model)
            )

        if self.train_set is None:
            raise ValueError("no train_set available — build/split the data first")
        if self.test_set is None:
            raise ValueError("no test_set available — build/split the data first")

        self._reset()

        start = time.time()
        model.fit(self.train_set, self.val_set)
        train_time = time.time() - start

        _, ranking_metrics = self.organize_metrics(metrics)

        start = time.time()
        model.transform(self.test_set)
        test_result = self._eval(model, self.test_set, ranking_metrics)
        test_time = time.time() - start
        test_result.metric_avg_results["Train (s)"] = train_time
        test_result.metric_avg_results["Test (s)"] = test_time

        val_result = None
        if show_validation and self.val_set is not None:
            start = time.time()
            model.transform(self.val_set)
            val_result = self._eval(model, self.val_set, ranking_metrics)
            val_result.metric_avg_results["Time (s)"] = time.time() - start

        return test_result, val_result

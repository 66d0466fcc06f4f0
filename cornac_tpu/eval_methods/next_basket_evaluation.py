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

    avg_results = {"conventional": [], "repetition": [], "exploration": []}
    user_results = {
        "conventional": [{} for _ in enumerate(metrics)],
        "repetition": [{} for _ in enumerate(metrics)],
        "exploration": [{} for _ in enumerate(metrics)],
    }

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

    _run("conventional", lambda t: t[2])
    if repetition_eval:
        _run(
            "repetition",
            lambda t: [
                i for i in t[2] if i in {x for b in t[1] for x in b}
            ],
        )
    if exploration_eval:
        _run(
            "exploration",
            lambda t: [
                i for i in t[2] if i not in {x for b in t[1] for x in b}
            ],
        )

    for i, mt in enumerate(metrics):
        avg_results["conventional"].append(
            np.mean(list(user_results["conventional"][i].values()))
            if user_results["conventional"][i]
            else 0
        )
        if repetition_eval:
            avg_results["repetition"].append(
                np.mean(list(user_results["repetition"][i].values()))
                if user_results["repetition"][i]
                else 0
            )
        if exploration_eval:
            avg_results["exploration"].append(
                np.mean(list(user_results["exploration"][i].values()))
                if user_results["exploration"][i]
                else 0
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
        user_arr = [u for (u, *_rest) in self.data]
        all_users = np.unique(user_arr)
        self.rng.shuffle(all_users)

        train_users = set(all_users[: self.train_size])
        test_users = set(all_users[-self.test_size :])
        val_users = set(all_users[self.train_size : -self.test_size])

        train_idx = [i for i, u in enumerate(user_arr) if u in train_users]
        test_idx = [i for i, u in enumerate(user_arr) if u in test_users]
        val_idx = [i for i, u in enumerate(user_arr) if u in val_users]

        train_data = safe_indexing(self.data, train_idx)
        test_data = safe_indexing(self.data, test_idx)
        val_data = safe_indexing(self.data, val_idx) if len(val_idx) > 0 else None

        self.build(train_data=train_data, test_data=test_data, val_data=val_data)

    def _build_datasets(self, train_data, test_data, val_data=None):
        self.train_set = BasketDataset.build(
            data=train_data,
            fmt=self.fmt,
            global_uid_map=self.global_uid_map,
            global_iid_map=self.global_iid_map,
            seed=self.seed,
            exclude_unknowns=False,
        )
        self.test_set = BasketDataset.build(
            data=test_data,
            fmt=self.fmt,
            global_uid_map=self.global_uid_map,
            global_iid_map=self.global_iid_map,
            seed=self.seed,
            exclude_unknowns=self.exclude_unknowns,
        )
        if val_data is not None and len(val_data) > 0:
            self.val_set = BasketDataset.build(
                data=val_data,
                fmt=self.fmt,
                global_uid_map=self.global_uid_map,
                global_iid_map=self.global_iid_map,
                seed=self.seed,
                exclude_unknowns=self.exclude_unknowns,
            )

        self.total_baskets = 0 if self.val_set is None else self.val_set.num_baskets
        self.total_baskets += self.test_set.num_baskets + self.train_set.num_baskets
        if self.verbose:
            print("Total users = {}".format(self.total_users))
            print("Total baskets = {}".format(self.total_baskets))

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

        for i, mt in enumerate(ranking_metrics):
            metric_avg_results[mt.name] = avg_results["conventional"][i]
            metric_user_results[mt.name] = user_results["conventional"][i]

        if self.repetition_eval:
            for i, mt in enumerate(ranking_metrics):
                metric_avg_results["{}-rep".format(mt.name)] = avg_results[
                    "repetition"
                ][i]
                metric_user_results["{}-rep".format(mt.name)] = user_results[
                    "repetition"
                ][i]
        if self.exploration_eval:
            for i, mt in enumerate(ranking_metrics):
                metric_avg_results["{}-expl".format(mt.name)] = avg_results[
                    "exploration"
                ][i]
                metric_user_results["{}-expl".format(mt.name)] = user_results[
                    "exploration"
                ][i]

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

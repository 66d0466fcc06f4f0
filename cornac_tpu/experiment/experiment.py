"""Experiment: run many models through one evaluation method.

Parity with reference ``cornac/experiment/experiment.py:26-167``.
"""

import os
from datetime import datetime

from ..metrics.ranking import RankingMetric
from ..metrics.rating import RatingMetric
from ..models.recommender import Recommender
from .result import CVExperimentResult, ExperimentResult


class Experiment:
    """Evaluate ``models`` with ``metrics`` under ``eval_method``, print the
    comparison table, and append it to a timestamped log file.

    Parameters
    ----------
    eval_method: BaseMethod
        Evaluation protocol (e.g. RatioSplit).
    models: list of Recommender
        Models to compare.
    metrics: list of RatingMetric/RankingMetric
        Metrics to report.
    user_based: bool, default: True
        Average rating metrics per-user first (vs per-rating).
    show_validation: bool, default: True
        Also report results on the validation set when present.
    verbose: bool, default: False
        Propagates to the eval method and the models.
    save_dir: str, optional
        Where to store trained models and the log file.
    """

    def __init__(
        self,
        eval_method,
        models,
        metrics,
        user_based=True,
        show_validation=True,
        verbose=False,
        save_dir=None,
    ):
        self.eval_method = eval_method
        self.models = self._validate_models(models)
        self.metrics = self._validate_metrics(metrics)
        self.user_based = user_based
        self.show_validation = show_validation
        self.verbose = verbose
        self.save_dir = save_dir
        self.result = None
        self.val_result = None

    @staticmethod
    def _validate_models(input_models):
        if not hasattr(input_models, "__len__"):
            raise ValueError(
                "models have to be an array but {}".format(type(input_models))
            )
        return [m for m in input_models if isinstance(m, Recommender)]

    @staticmethod
    def _validate_metrics(input_metrics):
        if not hasattr(input_metrics, "__len__"):
            raise ValueError(
                "metrics have to be an array but {}".format(type(input_metrics))
            )
        return [
            m
            for m in input_metrics
            if isinstance(m, (RatingMetric, RankingMetric))
        ]

    def _create_result(self):
        from ..eval_methods.cross_validation import CrossValidation
        from ..eval_methods.propensity_stratified_evaluation import (
            PropensityStratifiedEvaluation,
        )

        if isinstance(
            self.eval_method, (CrossValidation, PropensityStratifiedEvaluation)
        ):
            self.result = CVExperimentResult()
        else:
            self.result = ExperimentResult()
            if self.show_validation and self.eval_method.val_set is not None:
                self.val_result = ExperimentResult()

    def run(self):
        """Fit + evaluate every model; print and log the result tables."""
        self._create_result()

        if self.verbose:
            self.eval_method.verbose = self.verbose
            for model in self.models:
                model.verbose = self.verbose

        for model in self.models:
            test_result, val_result = self.eval_method.evaluate(
                model=model,
                metrics=self.metrics,
                user_based=self.user_based,
                show_validation=self.show_validation,
            )

            self.result.append(test_result)
            if self.val_result is not None:
                self.val_result.append(val_result)

            if self.save_dir and (not isinstance(self.result, CVExperimentResult)):
                model.save(self.save_dir)

        output = ""
        if self.val_result is not None:
            output += "\nVALIDATION:\n...\n{}".format(self.val_result)
        output += "\nTEST:\n...\n{}".format(self.result)

        print(output)

        timestamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S-%f")
        save_dir = "." if self.save_dir is None else self.save_dir
        output_file = os.path.join(save_dir, "CornacExp-{}.log".format(timestamp))
        with open(output_file, "w") as f:
            f.write(output)

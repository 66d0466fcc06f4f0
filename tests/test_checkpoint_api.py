"""Public checkpoint/resume API: periodic training checkpoints written by
the trainers themselves (via utils.checkpoint.epoch_loop), and a resumed
fit that is bit-identical to an uninterrupted one.

The reference has no mid-training resume — ``fit()`` always restarts
(reference ``models/recommender.py:223-304`` persists only finished
models); this is the SURVEY §5 capability on top of the reference surface.
"""

import numpy as np
import pytest

from cornac_tpu.data import Dataset, Reader

import os

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
RATING_TXT = os.path.join(DATA_DIR, "rating.txt")


@pytest.fixture(scope="module")
def train_set():
    data = Reader().read(RATING_TXT, fmt="UIR")
    return Dataset.from_uir(data, seed=11)


class TestBPRCheckpoint:
    def test_periodic_checkpoints_written(self, tmp_path, train_set):
        from cornac_tpu.models import BPR
        from cornac_tpu.utils.checkpoint import CheckpointManager

        model = BPR(k=4, max_iter=7, seed=42).enable_checkpointing(
            tmp_path / "bpr", every=3
        )
        model.fit(train_set)
        mgr = CheckpointManager(str(tmp_path / "bpr"))
        # every=3 over 7 epochs -> saves at 3, 6, 7
        assert mgr.all_steps() == [3, 6, 7]
        mgr.close()

    def test_resume_bit_identical(self, tmp_path, train_set):
        from cornac_tpu.models import BPR

        straight = BPR(k=4, max_iter=10, seed=42).fit(train_set)

        # "crash" after 4 epochs: train a 4-epoch model that checkpoints...
        BPR(k=4, max_iter=4, seed=42).enable_checkpointing(
            tmp_path / "c", every=2
        ).fit(train_set)
        # ...then a fresh process picks up from the newest checkpoint
        resumed = BPR(k=4, max_iter=10, seed=42).enable_checkpointing(
            tmp_path / "c", every=2
        ).fit(train_set)

        np.testing.assert_array_equal(straight.u_factors, resumed.u_factors)
        np.testing.assert_array_equal(straight.i_factors, resumed.i_factors)
        np.testing.assert_array_equal(straight.i_biases, resumed.i_biases)

    def test_verbose_chunking_matches_single_program(self, train_set, capsys):
        """Key folding is on the global epoch: per-epoch chunked (verbose)
        training now equals the whole-fit-in-one-program path exactly."""
        from cornac_tpu.models import BPR

        a = BPR(k=4, max_iter=5, seed=42, verbose=False).fit(train_set)
        b = BPR(k=4, max_iter=5, seed=42, verbose=True).fit(train_set)
        capsys.readouterr()
        np.testing.assert_array_equal(a.u_factors, b.u_factors)
        np.testing.assert_array_equal(a.i_factors, b.i_factors)


class TestMFCheckpoint:
    @pytest.mark.parametrize("optimizer", ["sgd", "adam"])
    def test_resume_bit_identical(self, tmp_path, train_set, optimizer):
        from cornac_tpu.models import MF

        kw = dict(k=4, max_iter=8, optimizer=optimizer, seed=3)
        straight = MF(**kw).fit(train_set)

        MF(**{**kw, "max_iter": 3}).enable_checkpointing(
            tmp_path / optimizer, every=3
        ).fit(train_set)
        resumed = MF(**kw).enable_checkpointing(
            tmp_path / optimizer, every=3
        ).fit(train_set)

        np.testing.assert_array_equal(straight.u_factors, resumed.u_factors)
        np.testing.assert_array_equal(straight.i_factors, resumed.i_factors)
        np.testing.assert_array_equal(straight.u_biases, resumed.u_biases)

    def test_early_stop_still_works(self, train_set, capsys):
        from cornac_tpu.models import MF

        m = MF(k=4, max_iter=50, learning_rate=0.0, early_stop=True,
               seed=3, verbose=True)
        m.fit(train_set)
        out = capsys.readouterr().out
        assert "Early stopping" in out


class TestVAECFCheckpoint:
    def test_resume_bit_identical(self, tmp_path, train_set):
        from cornac_tpu.models import VAECF

        kw = dict(k=4, autoencoder_structure=[8], n_epochs=8, batch_size=16,
                  seed=7)
        straight = VAECF(**kw).fit(train_set)

        VAECF(**{**kw, "n_epochs": 3}).enable_checkpointing(
            tmp_path / "v", every=3
        ).fit(train_set)
        resumed = VAECF(**kw).enable_checkpointing(
            tmp_path / "v", every=3
        ).fit(train_set)

        for ls, lr in zip(
            __import__("jax").tree_util.tree_leaves(straight.params),
            __import__("jax").tree_util.tree_leaves(resumed.params),
        ):
            np.testing.assert_array_equal(np.asarray(ls), np.asarray(lr))

    def test_sparse_resident_resume_bit_identical(self, tmp_path, train_set,
                                                  monkeypatch):
        """The r5 sparse-coordinate mode keys epochs on the GLOBAL index, so
        a checkpointed+resumed fit must equal an uninterrupted one in that
        mode too (the epoch-runner is shared with the resident path, but
        the data plumbing differs — guard it directly)."""
        import jax

        from cornac_tpu.models import VAECF, vaecf as vaecf_mod

        monkeypatch.setattr(vaecf_mod, "_RESIDENT_BYTES", 0)
        kw = dict(k=4, autoencoder_structure=[8], n_epochs=8, batch_size=16,
                  seed=7)
        straight = VAECF(**kw).fit(train_set)

        VAECF(**{**kw, "n_epochs": 3}).enable_checkpointing(
            tmp_path / "vs", every=3
        ).fit(train_set)
        resumed = VAECF(**kw).enable_checkpointing(
            tmp_path / "vs", every=3
        ).fit(train_set)

        for ls, lr in zip(
            jax.tree_util.tree_leaves(straight.params),
            jax.tree_util.tree_leaves(resumed.params),
        ):
            np.testing.assert_array_equal(np.asarray(ls), np.asarray(lr))

    def test_resume_skips_completed_fit(self, tmp_path, train_set):
        from cornac_tpu.models import VAECF

        kw = dict(k=4, autoencoder_structure=[8], n_epochs=4, batch_size=16,
                  seed=7)
        first = VAECF(**kw).enable_checkpointing(tmp_path / "d", every=2).fit(
            train_set
        )
        again = VAECF(**kw).enable_checkpointing(tmp_path / "d", every=2).fit(
            train_set
        )
        for ls, lr in zip(
            __import__("jax").tree_util.tree_leaves(first.params),
            __import__("jax").tree_util.tree_leaves(again.params),
        ):
            np.testing.assert_array_equal(np.asarray(ls), np.asarray(lr))


class TestMoreFamilies:
    def test_pmf_resume_bit_identical(self, tmp_path, train_set):
        from cornac_tpu.models import PMF

        kw = dict(k=3, max_iter=6, seed=9)
        straight = PMF(**kw).fit(train_set)
        PMF(**{**kw, "max_iter": 2}).enable_checkpointing(
            tmp_path / "p", every=2
        ).fit(train_set)
        resumed = PMF(**kw).enable_checkpointing(tmp_path / "p", every=2).fit(
            train_set
        )
        np.testing.assert_array_equal(straight.U, resumed.U)
        np.testing.assert_array_equal(straight.V, resumed.V)

    def test_wmf_resume_bit_identical(self, tmp_path, train_set):
        from cornac_tpu.models import WMF

        kw = dict(k=3, max_iter=6, seed=9)
        straight = WMF(**kw).fit(train_set)
        WMF(**{**kw, "max_iter": 2}).enable_checkpointing(
            tmp_path / "w", every=2
        ).fit(train_set)
        resumed = WMF(**kw).enable_checkpointing(tmp_path / "w", every=2).fit(
            train_set
        )
        np.testing.assert_array_equal(straight.U, resumed.U)
        np.testing.assert_array_equal(straight.V, resumed.V)


class TestSequentialCheckpoint:
    @pytest.fixture(scope="class")
    def seq_sets(self):
        from cornac_tpu.eval_methods import NextItemEvaluation

        data = Reader().read(os.path.join(DATA_DIR, "sequence.txt"), fmt="USIT")
        sids = sorted({t[1] for t in data})
        cut = sids[int(len(sids) * 0.7)]
        ev = NextItemEvaluation.from_splits(
            train_data=[t for t in data if t[1] <= cut],
            test_data=[t for t in data if t[1] > cut],
            fmt="USIT", exclude_unknowns=True, seed=3, mode="next",
        )
        return ev.train_set

    @pytest.mark.parametrize("model_name", ["GRU4Rec", "SASRec"])
    def test_resume_bit_identical(self, tmp_path, seq_sets, model_name):
        import cornac_tpu.models as M

        kw = dict(
            GRU4Rec=dict(layers=[8], n_epochs=4, batch_size=8, seed=5),
            SASRec=dict(embedding_dim=8, n_epochs=4, batch_size=8, seed=5),
        )[model_name]
        cls = getattr(M, model_name)
        straight = cls(**kw).fit(seq_sets)

        cls(**{**kw, "n_epochs": 2}).enable_checkpointing(
            tmp_path / model_name, every=2
        ).fit(seq_sets)
        resumed = cls(**kw).enable_checkpointing(
            tmp_path / model_name, every=2
        ).fit(seq_sets)

        import jax

        for ls, lr in zip(
            jax.tree_util.tree_leaves(straight.params),
            jax.tree_util.tree_leaves(resumed.params),
        ):
            np.testing.assert_array_equal(np.asarray(ls), np.asarray(lr))


class TestExperimentCheckpoint:
    def test_experiment_checkpoint_dir(self, tmp_path, train_set):
        from cornac_tpu.eval_methods import RatioSplit
        from cornac_tpu.experiment import Experiment
        from cornac_tpu.metrics import AUC
        from cornac_tpu.models import BPR

        data = Reader().read(RATING_TXT, fmt="UIR")
        rs = RatioSplit(data=data, test_size=0.2, seed=5, verbose=False)
        exp = Experiment(
            eval_method=rs,
            models=[BPR(k=4, max_iter=6, seed=1)],
            metrics=[AUC()],
            checkpoint_dir=str(tmp_path / "exp"),
            checkpoint_every=2,
            verbose=False,
            save_dir=None,
        )
        exp.run()
        from cornac_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "exp" / "BPR"))
        assert mgr.all_steps()[-1] == 6
        mgr.close()

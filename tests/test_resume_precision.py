"""Tests for mid-training resume and bf16 mixed-precision training."""
import dataclasses
import math

import jax
import numpy as np
import pytest

from gnnep_tpu.data.batching import epoch_batches
from gnnep_tpu.models.alignn import init_alignn
from gnnep_tpu.train.artifacts import load_pytree, save_pytree
from gnnep_tpu.train.config import TrainConfig
from gnnep_tpu.train.ensemble import model_config, prepare
from gnnep_tpu.train.loop import TrainHyper, make_train_step, sigma_mask
from gnnep_tpu.train.member import train_member

from synthetic import make_store


class TestPytreeIO:
    def test_roundtrip_nested(self, tmp_path, rng):
        tree = {"a": np.float32(rng.normal(size=(3, 4))),
                "b": [np.arange(5), {"c": np.float32(rng.normal(size=2))}]}
        p = tmp_path / "state.npz"
        save_pytree(p, tree, meta={"epoch": 7})
        got, meta = load_pytree(p, tree)
        assert meta["epoch"] == 7
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a))


class TestResume:
    def _cfg(self, tmp_path, epochs, **kw):
        return TrainConfig(
            save_dir=str(tmp_path), batch_size=8, epochs=epochs, hidden=16,
            layers=1, heads=2, ensemble_size=2, seed=42, val_frac=0.2,
            calib_frac=0.1, test_frac=0.1, bootstrap=False,
            feature_jitter_std=0.0, verbose=False, **kw)

    def test_checkpoint_written_and_cleared(self, tmp_path):
        store = make_store(16, seed=8)
        cfg = self._cfg(tmp_path, epochs=3, checkpoint_every=1)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        params, metrics = train_member(
            setup.store, cfg, mc, setup.transformer, setup.budget, 42,
            setup.train_idx, setup.val_idx)
        # resume file cleaned up after successful completion
        assert not (tmp_path / "resume_member_42.npz").exists()
        assert math.isfinite(metrics.get("mae", float("nan")))

    def test_resume_continues_from_checkpoint(self, tmp_path):
        store = make_store(16, seed=8)
        # run 2 epochs with checkpointing, simulating a crash by capping epochs
        cfg2 = self._cfg(tmp_path, epochs=2, checkpoint_every=1)
        setup = prepare(cfg2, store)
        mc = model_config(cfg2, setup.store)
        train_member(setup.store, cfg2, mc, setup.transformer, setup.budget,
                     42, setup.train_idx, setup.val_idx)
        # manually keep the resume file as if the run had crashed at epoch 2
        # (train_member removes it on success, so recreate a fresh 2-epoch run
        # with a patched unlink)
        import gnnep_tpu.train.member as member_mod
        from pathlib import Path
        orig_unlink = Path.unlink
        try:
            Path.unlink = lambda self, *a, **k: None  # keep resume file
            train_member(setup.store, cfg2, mc, setup.transformer, setup.budget,
                         42, setup.train_idx, setup.val_idx)
        finally:
            Path.unlink = orig_unlink
        assert (tmp_path / "resume_member_42.npz").exists()
        import json
        with np.load(tmp_path / "resume_member_42.npz", allow_pickle=False) as d:
            meta = json.loads(str(d["meta_json"]))
        assert meta["epoch"] == 2

        # resume with a higher epoch budget: starts at epoch 3
        cfg4 = self._cfg(tmp_path, epochs=4, checkpoint_every=1, resume=True)
        import io
        from contextlib import redirect_stdout
        cfg4 = dataclasses.replace(cfg4, verbose=True)
        buf = io.StringIO()
        with redirect_stdout(buf):
            train_member(setup.store, cfg4, mc, setup.transformer, setup.budget,
                         42, setup.train_idx, setup.val_idx)
        out = buf.getvalue()
        assert "resumed at epoch 3" in out
        assert "Epoch 003" in out and "Epoch 002" not in out


class TestFlatOptResumeGuard:
    def test_flat_opt_mismatch_raises_instead_of_silent_restart(self, tmp_path):
        """ADVICE r2: a resume checkpoint written under the other opt_state
        layout (flat vector vs per-leaf Adam) must raise a clear error, not
        silently discard mid-training progress via the fallback branch."""
        import dataclasses
        import pytest

        from gnnep_tpu.train.config import TrainConfig
        from gnnep_tpu.train.ensemble import model_config, prepare
        from gnnep_tpu.train.member import train_member
        from synthetic import make_store

        store = make_store(16, seed=8)
        cfg = TrainConfig(batch_size=8, hidden=16, layers=1, heads=2,
                          epochs=2, checkpoint_every=1, val_frac=0.2,
                          calib_frac=0.0, test_frac=0.0, early_stop=10,
                          verbose=False, bootstrap=False,
                          save_dir=str(tmp_path), flat_opt=False)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        from pathlib import Path
        orig_unlink = Path.unlink
        try:
            Path.unlink = lambda self, *a, **k: None  # simulate a crash
            train_member(setup.store, cfg, mc, setup.transformer, setup.budget,
                         42, setup.train_idx, setup.val_idx)
        finally:
            Path.unlink = orig_unlink
        assert (tmp_path / "resume_member_42.npz").exists()

        flipped = dataclasses.replace(cfg, flat_opt=True, resume=True)
        with pytest.raises(RuntimeError, match="flat_opt"):
            train_member(setup.store, flipped, mc, setup.transformer,
                         setup.budget, 42, setup.train_idx, setup.val_idx)


class TestBf16:
    def test_bf16_step_runs_and_learns(self):
        store = make_store(12, seed=9)
        cfg = TrainConfig(batch_size=12, hidden=16, layers=1, heads=2,
                          ensemble_size=2, verbose=False)
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        hyper = TrainHyper(feature_jitter_std=0.0, compute_dtype="bfloat16")
        step, init_opt = make_train_step(mc, hyper, setup.transformer.means,
                                         setup.transformer.stds)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        opt = init_opt(params)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        losses = []
        key = jax.random.PRNGKey(1)
        for _ in range(25):
            for b in batches:
                key, k = jax.random.split(key)
                params, opt, m = step(params, opt, smask, b, k, 3e-3, 3e-3)
            losses.append(float(m.loss_sum) / max(float(m.n_graphs), 1))
        assert losses[-1] < losses[0]
        # master params remain fp32
        assert all(np.asarray(l).dtype == np.float32
                   for l in jax.tree.leaves(params))


class TestAdamVariant:
    def test_adam_coupled_decay_runs_and_learns(self):
        from gnnep_tpu.data.batching import epoch_batches
        from gnnep_tpu.train.ensemble import model_config, prepare
        from gnnep_tpu.train.loop import make_train_step
        from synthetic import make_store

        store = make_store(12, seed=9)
        cfg = TrainConfig(batch_size=12, hidden=16, layers=1, heads=2,
                          ensemble_size=2, verbose=False, optimizer="adam")
        setup = prepare(cfg, store)
        mc = model_config(cfg, setup.store)
        hyper = TrainHyper(feature_jitter_std=0.0, optimizer="adam",
                           weight_decay=1e-2)
        step, init_opt = make_train_step(mc, hyper, setup.transformer.means,
                                         setup.transformer.stds)
        params = init_alignn(jax.random.PRNGKey(0), mc)
        opt = init_opt(params)
        smask = sigma_mask(params)
        batches = epoch_batches(setup.store, setup.train_idx, setup.budget,
                                shuffle=False)
        losses = []
        key = jax.random.PRNGKey(1)
        for _ in range(20):
            for b in batches:
                key, k = jax.random.split(key)
                params, opt, m = step(params, opt, smask, b, k, 3e-3, 3e-3)
            losses.append(float(m.loss_sum) / max(float(m.n_graphs), 1))
        assert losses[-1] < losses[0]

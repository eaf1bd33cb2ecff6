"""Reference-artifact conversion: shipped .pt constants + state-dict mapping."""
import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from synthetic import make_store  # noqa: E402

torch = pytest.importorskip("torch")

REF = Path("/root/reference/artifacts/ensemble")


class TestShippedArtifacts:
    """The shipped reference calibration artifacts are the ground-truth
    parity vectors (BASELINE.md): conversion must reproduce them exactly."""

    @pytest.mark.skipif(not (REF / "scaler_state.pt").exists(),
                        reason="reference artifacts not present")
    def test_scaler_state_roundtrip(self, tmp_path):
        from gnnep_tpu.train.artifacts import load_scaler_state
        from gnnep_tpu.train.convert import convert_scaler_state

        scaler, transformer = convert_scaler_state(
            REF / "scaler_state.pt", tmp_path / "scaler_state.npz")
        np.testing.assert_allclose(transformer.means, [4.3228, 3.5567],
                                   atol=1e-3)
        np.testing.assert_allclose(transformer.stds, [0.9051, 0.9405],
                                   atol=1e-3)
        assert scaler.scalar_mean.shape == (6,)
        assert scaler.embed_mean.shape == (200,)
        assert scaler.global_mean.shape == (59,)
        s2, t2, _ = load_scaler_state(tmp_path / "scaler_state.npz")
        np.testing.assert_allclose(t2.means, transformer.means)
        np.testing.assert_allclose(s2.global_std, scaler.global_std)
        # transform/inverse round trip through the shipped constants
        y = np.array([[123.0, 45.0]])
        np.testing.assert_allclose(t2.inverse(t2.transform(y)), y, rtol=1e-5)

    @pytest.mark.skipif(not (REF / "conformal.pt").exists(),
                        reason="reference artifacts not present")
    def test_conformal_roundtrip(self, tmp_path):
        from gnnep_tpu.train.artifacts import load_conformal
        from gnnep_tpu.train.convert import convert_conformal

        conf = convert_conformal(REF / "conformal.pt",
                                 tmp_path / "conformal.json")
        np.testing.assert_allclose(conf["q"], [0.9173, 1.5967], atol=1e-3)
        assert conf["method"] == "scaled" and conf["alpha"] == 0.1
        loaded = load_conformal(tmp_path / "conformal.json")
        np.testing.assert_allclose(loaded["q"], conf["q"], rtol=1e-6)
        np.testing.assert_allclose(loaded["affine_a"], [1.0234, 0.9961],
                                   atol=2e-2)  # stored bf16 in the reference


def _torch_member_state(rng, node_dim, edge_dim, angle_dim, global_dim,
                        hidden, layers, target_dim):
    """Random HeteroAlignnRegressor state dict with the reference's exact
    parameter names (train.py:303-401,528-586; PyG TransformerConv linears)."""
    t = lambda *shape: torch.from_numpy(
        rng.normal(scale=0.2, size=shape).astype(np.float32))
    sd = {}

    def mlp(prefix, in_dim):
        sd[f"{prefix}.0.weight"] = t(hidden, in_dim)
        sd[f"{prefix}.0.bias"] = t(hidden)
        sd[f"{prefix}.2.weight"] = t(hidden, hidden)
        sd[f"{prefix}.2.bias"] = t(hidden)

    mlp("base.node_encoder", node_dim)
    mlp("base.edge_encoder", edge_dim)
    mlp("base.angle_encoder", angle_dim)
    for i in range(layers):
        for blk, extra in ((f"base.edge_blocks.{i}", False),
                           (f"base.node_blocks.{i}", True)):
            if extra:
                sd[f"{blk}.edge_proj.weight"] = t(hidden, hidden)
                sd[f"{blk}.edge_proj.bias"] = t(hidden)
            for lin in ("lin_query", "lin_key", "lin_value", "lin_skip"):
                sd[f"{blk}.conv.{lin}.weight"] = t(hidden, hidden)
                sd[f"{blk}.conv.{lin}.bias"] = t(hidden)
            sd[f"{blk}.conv.lin_edge.weight"] = t(hidden, hidden)
            sd[f"{blk}.conv.lin_beta.weight"] = t(1, 3 * hidden)
            sd[f"{blk}.norm.weight"] = t(hidden)
            sd[f"{blk}.norm.bias"] = t(hidden)
    sd["base.feat_proj.0.weight"] = t(hidden, hidden + global_dim)
    sd["base.feat_proj.0.bias"] = t(hidden)
    for tgt in range(target_dim):
        # base.output_heads exist in the checkpoint but are unused by the
        # hetero wrapper — the converter must drop them
        sd[f"base.output_heads.{tgt}.weight"] = t(1, hidden)
        sd[f"base.output_heads.{tgt}.bias"] = t(1)
        sd[f"mean_heads.{tgt}.weight"] = t(1, hidden)
        sd[f"mean_heads.{tgt}.bias"] = t(1)
        sd[f"logvar_heads.{tgt}.weight"] = t(1, hidden)
        sd[f"logvar_heads.{tgt}.bias"] = t(1)
    return sd


class TestMemberConversion:
    def test_mapping_and_forward(self, rng, tmp_path):
        import dataclasses as dc

        from gnnep_tpu.data.batching import BatchBudget, BatchPacker
        from gnnep_tpu.models.alignn import alignn_apply, alignn_embed
        from gnnep_tpu.train.artifacts import load_member, save_member
        from gnnep_tpu.train.convert import convert_member_state

        store = make_store(8, seed=2)
        hidden, layers, heads, tdim = 8, 2, 2, 2
        gdim = store.global_scalar_dim + 230
        sd = _torch_member_state(rng, store.node_dim, store.edge_dim,
                                 store.angle_dim, gdim, hidden, layers, tdim)
        params, cfg = convert_member_state(sd, heads=heads, dropout=0.0)
        assert (cfg.node_dim, cfg.hidden, cfg.layers, cfg.target_dim) == (
            store.node_dim, hidden, layers, tdim)
        assert cfg.global_dim == gdim

        # exact weight mapping: transposed torch layouts, per-leaf
        np.testing.assert_allclose(
            params["node_enc"]["w0"],
            sd["base.node_encoder.0.weight"].numpy().T)
        np.testing.assert_allclose(
            params["edge_blocks"][1]["conv"].w_key,
            sd["base.edge_blocks.1.conv.lin_key.weight"].numpy().T)
        np.testing.assert_allclose(
            params["node_blocks"][0]["conv"].w_beta,
            sd["base.node_blocks.0.conv.lin_beta.weight"].numpy().T)
        np.testing.assert_allclose(
            params["mean_head"]["w"][:, 1],
            sd["mean_heads.1.weight"].numpy()[0])
        np.testing.assert_allclose(
            params["logvar_head"]["b"],
            np.concatenate([sd["logvar_heads.0.bias"].numpy(),
                            sd["logvar_heads.1.bias"].numpy()]))

        # encoder numerics: our MLP == torch Sequential computed manually
        x = rng.normal(size=(5, store.node_dim)).astype(np.float32)
        w0 = sd["base.node_encoder.0.weight"].numpy()
        b0 = sd["base.node_encoder.0.bias"].numpy()
        w1 = sd["base.node_encoder.2.weight"].numpy()
        b1 = sd["base.node_encoder.2.bias"].numpy()
        want = np.maximum(x @ w0.T + b0, 0) @ w1.T + b1
        from gnnep_tpu.models.alignn import _mlp
        got = np.asarray(_mlp(params["node_enc"], x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        # full forward on a packed batch; head wiring vs the embedding
        budget = BatchBudget.plan(store, range(8), batch_size=8)
        batch = next(iter(BatchPacker(store, budget).pack(range(8))))
        mean, logvar = alignn_apply(params, cfg, batch)
        assert np.isfinite(np.asarray(mean)).all()
        z = np.asarray(alignn_embed(params, cfg, batch))
        np.testing.assert_allclose(
            np.asarray(mean), z @ params["mean_head"]["w"]
            + params["mean_head"]["b"], rtol=1e-4, atol=1e-5)

        # checkpoint round trip through our artifact format
        save_member(tmp_path / "model_0.npz", params, cfg)
        p2, cfg2 = load_member(tmp_path / "model_0.npz")
        assert cfg2.hidden == hidden
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    @pytest.mark.skipif(not (REF / "scaler_state.pt").exists(),
                        reason="reference artifacts not present")
    def test_cli_on_shipped_dir(self, tmp_path):
        from gnnep_tpu.cli.convert import main

        main(["--reference-dir", str(REF), "--out-dir", str(tmp_path),
              "--quiet"])
        assert (tmp_path / "scaler_state.npz").exists()
        assert json.loads((tmp_path / "conformal.json").read_text())[
            "method"] == "scaled"

import numpy as np
import pytest

from rift_tpu.train import apply_overrides, get_config, presets
from rift_tpu.train.loop import evaluate_registration, train


def test_presets_cover_reference_tree():
    names = set(presets())
    # classification leaves (README table rows)
    for name in ("mn40_sph_dg", "mn40_sph_pt", "mn40_cu_dg", "mn40_cu_pt"):
        assert name in names
    # registration leaves: modes x estimators (SURVEY §2.1 "18 leaves")
    for mode in ("clean", "noise", "partial", "icl_nuim"):
        for method in ("ransac", "fgr", "teaserpp"):
            assert f"reg_{mode}_{method}_cu_dg" in names
            assert f"reg_{mode}_{method}_cu_pt" in names


def test_overrides():
    cfg = get_config("tiny_smoke")
    apply_overrides(cfg, ["model.dim_k=64", "evaluate.method='ransac'",
                          "optim.lr=0.01"])
    assert cfg.model.dim_k == 64
    assert cfg.evaluate.method == "ransac"
    assert cfg.optim.lr == 0.01


def test_override_unknown_field_rejected():
    cfg = get_config("tiny_smoke")
    try:
        apply_overrides(cfg, ["model.nonexistent=1"])
    except AttributeError:
        return
    raise AssertionError("expected AttributeError")


def test_train_smoke(tmp_path):
    """Two tiny epochs end-to-end: loss finite, checkpoint written,
    accuracy computed (ref: train.py main loop)."""
    cfg = get_config("tiny_smoke")
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.optim.num_epochs = 2
    cfg.train.steps_per_epoch = 2
    out = train(cfg, resume=False)
    assert "acc" in out["best"]
    assert (tmp_path / "ckpt" / "common").exists()


def test_registration_eval_smoke(tmp_path):
    cfg = get_config("tiny_smoke")
    cfg.model.is_classify = False
    cfg.model.extra_feature_channels = 4
    cfg.train.ckpt_dir = str(tmp_path / "none")  # hermetic: no repo ckpt pickup
    cfg.evaluate.num_pairs = 2
    cfg.evaluate.num_points = 64
    cfg.evaluate.method = "teaserpp"
    results = evaluate_registration(cfg)
    for key in ("rre", "rte", "rmse", "succ", "reg_time", "rmse_succ"):
        assert key in results
        assert np.isfinite(results[key])


@pytest.mark.slow
def test_evaluate_with_trained_checkpoint(tmp_path):
    """Round trip (VERDICT r1 item 2): train tiny -> save -> evaluate loads
    the TRAINED params (differ from a fresh init) and the snapshot arch.
    Ref: train.py:231-243 --eval_ckpt_pth / --best_ckpt_to_test."""
    import jax
    import jax.numpy as jnp

    from rift_tpu.train.loop import (build_model, evaluate_classification_ckpt,
                                     extractor_from_snapshot,
                                     load_trained_state)
    from rift_tpu.train.steps import create_state

    cfg = get_config("tiny_smoke")
    cfg.model.extra_feature_channels = 4  # registration trunk arch
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.optim.num_epochs = 1
    cfg.train.steps_per_epoch = 3
    train(cfg, resume=False)

    state, snap = load_trained_state(cfg.train.ckpt_dir, "best_acc")
    assert snap["model"]["extra_feature_channels"] == 4
    assert int(np.asarray(state.step)) == 3

    # trained params differ from a fresh same-seed init
    model = build_model(cfg)
    dummy = jnp.zeros((1, cfg.dataset.num_points, 6), jnp.float32)
    init_state, _ = create_state(model, cfg, dummy, 1, seed=cfg.seed)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        init_state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # registration eval restores the ckpt and runs batched
    reg = get_config("tiny_smoke")
    reg.evaluate.num_pairs = 2
    reg.evaluate.num_points = 64
    reg.evaluate.method = "teaserpp"
    reg.evaluate.ckpt_dir = cfg.train.ckpt_dir
    reg.evaluate.ckpt_name = "best_acc"
    results = evaluate_registration(reg)
    assert all(np.isfinite(v) for v in results.values())

    # snapshot arch wins over the eval preset (trunk must match weights)
    reg.model.dim_k = 999  # wrong on purpose; snapshot must override
    ext = extractor_from_snapshot(reg, snap)
    assert ext.dim_k == cfg.model.dim_k
    assert ext.is_classify is False

    # classification eval from the same checkpoint + rotation consistency
    cls = get_config("tiny_smoke")
    cls.model.extra_feature_channels = 4
    out = evaluate_classification_ckpt(
        cls, ckpt_dir=cfg.train.ckpt_dir, ckpt_name="best_acc", rotations=3)
    assert set(out) == {"acc", "acc_hard", "rot_agree", "logit_drift"}
    assert 0.0 <= out["acc"] <= 1.0
    assert 0.0 <= out["rot_agree"] <= 1.0
    assert np.isfinite(out["logit_drift"])


def test_batched_eval_matches_per_pair(tmp_path):
    """The one-dispatch-per-batch eval path reproduces the per-pair loop
    exactly (teaserpp/GNC is key-free and deterministic)."""
    import jax
    import jax.numpy as jnp

    from rift_tpu.data.registration_pairs import get_pairs
    from rift_tpu.ops.normals import estimate_normals
    from rift_tpu.registration import pair_errors, register_pair
    from rift_tpu.train.loop import build_model
    from rift_tpu.train.meters import MeterRegistration
    from rift_tpu.train.steps import create_state, make_eval_step

    cfg = get_config("tiny_smoke")
    cfg.model.is_classify = False
    cfg.model.extra_feature_channels = 4
    cfg.train.ckpt_dir = str(tmp_path / "none")
    cfg.evaluate.num_pairs = 3
    cfg.evaluate.num_points = 64
    cfg.evaluate.method = "teaserpp"
    cfg.evaluate.batch_pairs = 2  # forces a padded tail batch
    # single-hypothesis matching: this test checks BATCHED-DISPATCH
    # equivalence against the per-pair loop below, which matches without
    # the flip consensus
    cfg.evaluate.flip_hypotheses = False

    model = build_model(cfg)
    dummy = jnp.zeros((1, 64, 6), jnp.float32)
    state, _ = create_state(model, cfg, dummy, 1, seed=cfg.seed)
    batched = evaluate_registration(cfg, state=state, model=model)

    # per-pair reference loop (the round-1 evaluation semantics)
    eval_step = make_eval_step(model)
    pairs = get_pairs(None, 64, "noise", 3)
    meter = MeterRegistration()
    for batch in pairs.batches(batch_size=1):
        src = jnp.asarray(batch.source)
        dst = jnp.asarray(batch.target)
        gt = jnp.asarray(batch.transform)
        fs = eval_step(state, jnp.concatenate([src, estimate_normals(src)], -1))
        fd = eval_step(state, jnp.concatenate([dst, estimate_normals(dst)], -1))
        est, _ = register_pair(src[0], dst[0], fs[0], fd[0],
                               method="teaserpp",
                               noise_bound=cfg.evaluate.noise_bound)
        errors = pair_errors(src, gt, est[None])
        meter.update(jax.tree_util.tree_map(np.asarray, errors), 0.0)
    per_pair = meter.compute()
    for key in ("rre", "rte", "rmse", "succ", "rmse_succ"):
        np.testing.assert_allclose(batched[key], per_pair[key], rtol=1e-4,
                                   atol=1e-5, err_msg=key)


@pytest.mark.slow
def test_multimetric_best_tracking(tmp_path):
    """Meter-registry semantics (ref train.py:176-200): several registered
    meters, incl. a dict-valued one, each get best tracking + a best_{name}
    checkpoint; lower-is-better keys improve downward."""
    from rift_tpu.train.loop import MeterClassification, train

    class DictMeter:
        def __init__(self):
            self.n = 0

        def update(self, logits, labels):
            self.n += len(labels)

        def compute(self):
            return {"succ": 1.0, "rre": 0.5}

    cfg = get_config("tiny_smoke")
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.optim.num_epochs = 1
    cfg.train.steps_per_epoch = 2
    out = train(cfg, resume=False,
                meters={"acc": MeterClassification, "probe": DictMeter})
    assert "acc" in out["best"]
    assert out["best"]["probe_succ"] == 1.0
    assert out["best"]["probe_rre"] == 0.5
    assert (tmp_path / "ckpt" / "best_acc").exists()
    assert (tmp_path / "ckpt" / "best_probe_rre").exists()


def test_improved_direction():
    from rift_tpu.train.loop import _improved

    assert _improved("acc", 0.9, 0.8) and not _improved("acc", 0.7, 0.8)
    assert _improved("rre", 0.4, 0.5) and not _improved("rre", 0.6, 0.5)
    assert _improved("anything", 1.0, None)


def test_registration_probe_in_training(tmp_path):
    """reg_probe_interval wires a registration probe into valid epochs:
    best_reg_* metrics appear and a best_reg_rre checkpoint is written."""
    cfg = get_config("tiny_smoke")
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.optim.num_epochs = 1
    cfg.train.steps_per_epoch = 2
    cfg.train.reg_probe_interval = 1
    cfg.train.reg_probe_pairs = 2
    out = train(cfg, resume=False)
    assert "reg_rre" in out["best"]
    assert np.isfinite(out["best"]["reg_rre"])
    assert (tmp_path / "ckpt" / "best_reg_rre").exists()

import numpy as np

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


def test_registration_eval_smoke():
    cfg = get_config("tiny_smoke")
    cfg.model.is_classify = False
    cfg.model.extra_feature_channels = 4
    cfg.evaluate.num_pairs = 2
    cfg.evaluate.num_points = 64
    cfg.evaluate.method = "teaserpp"
    results = evaluate_registration(cfg)
    for key in ("rre", "rte", "rmse", "succ", "reg_time", "rmse_succ"):
        assert key in results
        assert np.isfinite(results[key])

"""End-to-end real-data-layout battery (VERDICT r3 #7): train on a real
ModelNet40 txt layout -> checkpoint -> classification eval -> registration
eval on a real DeepGMR-format h5 — the same code paths
`scripts/validate_flagship.py --data-root` drives, on tiny fixtures."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def _write_mn40_layout(root, num_classes=2, items=3, n=128):
    rs = np.random.RandomState(0)
    root.mkdir(parents=True, exist_ok=True)
    names = [f"class{c}" for c in range(num_classes)]
    (root / "modelnet40_shape_names.txt").write_text(
        "".join(f"{c}\n" for c in names))
    train_ids, test_ids = [], []
    for c, cname in enumerate(names):
        d = root / cname
        d.mkdir(parents=True)
        for i in range(items):
            pts = rs.randn(n, 6).astype(np.float32)
            pts[:, 3:] /= np.linalg.norm(pts[:, 3:], axis=-1, keepdims=True)
            fid = f"{cname}_{i:04d}"
            np.savetxt(d / f"{fid}.txt", pts, delimiter=",")
            (train_ids if i < items - 1 else test_ids).append(fid)
    (root / "modelnet40_train.txt").write_text(
        "".join(f"{i}\n" for i in train_ids))
    (root / "modelnet40_test.txt").write_text(
        "".join(f"{i}\n" for i in test_ids))


def _write_deepgmr_h5(path, m=4, n=64):
    rs = np.random.RandomState(3)
    source = rs.randn(m, n, 3).astype(np.float64)
    transform = np.tile(np.eye(4), (m, 1, 1))
    for i in range(m):
        ang = rs.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        transform[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        transform[i, :3, 3] = rs.uniform(-0.3, 0.3, 3)
    target = (np.einsum("mij,mnj->mni", transform[:, :3, :3], source)
              + transform[:, None, :3, 3])
    with h5py.File(path, "w") as f:
        f.create_dataset("source", data=source)
        f.create_dataset("target", data=target)
        f.create_dataset("transform", data=transform)


@pytest.mark.slow
def test_real_layout_train_eval_register_end_to_end(tmp_path):
    from rift_tpu.train import get_config
    from rift_tpu.train.loop import (evaluate_classification_ckpt,
                                     evaluate_registration, train)

    mn40 = tmp_path / "modelnet40_normal_resampled"
    _write_mn40_layout(mn40)
    h5 = tmp_path / "modelnet_noisy.h5"
    _write_deepgmr_h5(h5)

    cfg = get_config("tiny_smoke")
    cfg.dataset.root = str(mn40)
    cfg.dataset.num_points = 64
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.train.batch_size = 2
    cfg.optim.num_epochs = 1
    out = train(cfg, resume=False)
    assert "acc" in out["best"]

    # classification eval off the checkpoint, against the same real layout
    cls = evaluate_classification_ckpt(cfg, ckpt_dir=cfg.train.ckpt_dir,
                                       rotations=0, hard_tier=False)
    assert np.isfinite(cls["acc"])

    # registration eval on the real-format h5 with the trained trunk
    cfg.evaluate.pairs_path = str(h5)
    cfg.evaluate.num_points = 64
    cfg.evaluate.num_pairs = 4
    cfg.evaluate.batch_pairs = 4
    cfg.evaluate.method = "teaserpp"
    cfg.evaluate.num_hypotheses = 64
    cfg.evaluate.ckpt_dir = cfg.train.ckpt_dir
    results = evaluate_registration(cfg)
    for key in ("rre", "rte", "rmse", "succ"):
        assert np.isfinite(results[key])

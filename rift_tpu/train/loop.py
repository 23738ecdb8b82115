"""Training / validation / registration-evaluation loops.

Parity with `train.py` (ref): per-epoch train + valid with meters and
best-metric tracking (`train.py:136-202,317-355`), checkpoint save/resume,
and the `--evaluate` registration path (`train.py:229-253` ->
`deepgmr_mn40.py:71-97` test_registration). TensorBoard is replaced by a
JSONL metric writer (utils/logging.py) — structured, greppable, no extra
deps.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.modelnet40 import get_datasets
from ..data.registration_pairs import get_pairs
from ..models import PVCNNClassifier
from ..ops.normals import estimate_normals
from ..registration import pair_errors, register_pair
from .checkpoint import CheckpointManager
from .config import ExperimentConfig
from .meters import MeterClassification, MeterRegistration
from .steps import create_state, make_eval_step, make_train_step
from .utils import MetricWriter, get_logger


def build_model(config: ExperimentConfig) -> PVCNNClassifier:
    m = config.model
    return PVCNNClassifier(
        blocks=tuple(tuple(b) for b in m.blocks),
        dim_k=m.dim_k,
        num_classes=m.num_classes,
        point_kernel_formal=m.point_kernel_formal,
        voxel_shape=m.voxel_shape,
        with_coeff=m.with_coeff,
        with_se=m.with_se,
        extra_feature_channels=m.extra_feature_channels,
        width_multiplier=m.width_multiplier,
        voxel_resolution_multiplier=m.voxel_resolution_multiplier,
        is_classify=m.is_classify,
        rot_invariant_preprocess=m.rot_invariant_preprocess,
        with_local_feat=m.with_local_feat,
        with_transform_fine_tune=m.with_transform_fine_tune,
        use_new_coords_for_voxel=m.use_new_coords_for_voxel,
        local_neighbors=m.local_neighbors,
    )


def train(config: ExperimentConfig, resume: bool = True) -> dict:
    """Classification training (ref: train.py main loop)."""
    log = get_logger(config.name)
    writer = MetricWriter(config.train.ckpt_dir, config.name)
    datasets = get_datasets(config.dataset)
    model = build_model(config)

    steps_per_epoch = max(len(datasets["train"]) // config.train.batch_size, 1)
    if config.train.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, config.train.steps_per_epoch)

    sample = next(datasets["train"].batches(config.train.batch_size, seed=0))[0]
    state, tx = create_state(model, config, jnp.asarray(sample),
                             steps_per_epoch, seed=config.seed)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)

    ckpt = CheckpointManager(config.train.ckpt_dir)
    best: dict = {}
    start_epoch = 0
    if resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, best = restored
            start_epoch = int(state.step) // steps_per_epoch
            log.info("resumed from step %d (epoch %d)", int(state.step), start_epoch)

    rng = jax.random.PRNGKey(config.seed)
    for epoch in range(start_epoch, config.optim.num_epochs):
        t0 = time.time()
        losses = []
        for i, (clouds, labels) in enumerate(
            datasets["train"].batches(config.train.batch_size, seed=epoch)
        ):
            if i >= steps_per_epoch:
                break
            state, metrics = train_step(
                state, jnp.asarray(clouds), jnp.asarray(labels), rng
            )
            losses.append(metrics)
        loss = float(np.mean([float(m["loss"]) for m in losses]))
        acc = float(np.mean([float(m["acc"]) for m in losses]))
        writer.write(step=int(state.step), epoch=epoch, split="train",
                     loss=loss, acc=acc, sec=time.time() - t0)
        log.info("epoch %d: loss %.4f acc %.4f (%.1fs)", epoch, loss, acc,
                 time.time() - t0)

        if (epoch + 1) % config.train.valid_interval == 0:
            val = evaluate_classification(
                state, eval_step, datasets["valid"], config
            )
            writer.write(step=int(state.step), epoch=epoch, split="valid", acc=val)
            log.info("epoch %d: valid acc %.4f", epoch, val)
            if val >= best.get("acc", -1.0):
                best["acc"] = val
                ckpt.save_best("acc", state, best, config)
            ckpt.save_common(state, best, config)
    return {"state": state, "best": best}


def train_segmentation(config: ExperimentConfig, shapenet_config=None,
                       resume: bool = True) -> dict:
    """ShapeNet part-segmentation training (ref: §3.4 same harness with the
    seg model + IoU meter)."""
    import optax

    from ..data.shapenet import ShapeNetConfig, get_shapenet
    from ..models import ShapeNetPVCNN
    from .meters import MeterShapeNetIoU
    from .steps import TrainState, make_optimizer

    log = get_logger(config.name)
    writer = MetricWriter(config.train.ckpt_dir, config.name)
    sn_cfg = shapenet_config or ShapeNetConfig(num_points=config.dataset.num_points)
    datasets = get_shapenet(sn_cfg)
    m = config.model
    model = ShapeNetPVCNN(
        blocks=tuple(tuple(b) for b in m.blocks),
        point_kernel_formal=m.point_kernel_formal,
        voxel_shape=m.voxel_shape,
        rot_invariant_preprocess=m.rot_invariant_preprocess,
        with_local_feat=bool(m.with_local_feat),
        local_neighbors=m.local_neighbors,
        width_multiplier=m.width_multiplier,
    )
    steps_per_epoch = max(len(datasets["train"]) // config.train.batch_size, 1)
    if config.train.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, config.train.steps_per_epoch)

    clouds, labels = next(datasets["train"].batches(config.train.batch_size, 0))
    variables = model.init(
        {"params": jax.random.PRNGKey(config.seed),
         "dropout": jax.random.PRNGKey(config.seed + 1)},
        jnp.asarray(clouds), train=False,
    )
    tx = make_optimizer(config, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )

    @jax.jit
    def seg_step(state, clouds, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                clouds, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            logp = jax.nn.log_softmax(out)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, labels[..., None], axis=-1)
            )
            return loss, (out, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), loss, logits

    rng = jax.random.PRNGKey(config.seed)
    best: dict = {}
    ckpt = CheckpointManager(config.train.ckpt_dir)
    for epoch in range(config.optim.num_epochs):
        t0 = time.time()
        losses = []
        for i, (clouds, labels) in enumerate(
            datasets["train"].batches(config.train.batch_size, seed=epoch)
        ):
            if i >= steps_per_epoch:
                break
            state, loss, _ = seg_step(state, jnp.asarray(clouds),
                                      jnp.asarray(labels), rng)
            losses.append(float(loss))
        meter = MeterShapeNetIoU()
        for clouds, labels in datasets["test"].batches(
            config.train.eval_batch_size, seed=0, shuffle=False, drop_last=False
        ):
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                jnp.asarray(clouds), train=False,
            )
            meter.update(np.asarray(logits), labels)
        iou = meter.compute()
        writer.write(step=int(state.step), epoch=epoch, split="train",
                     loss=float(np.mean(losses)), iou=iou, sec=time.time() - t0)
        log.info("seg epoch %d: loss %.4f mIoU %.4f", epoch,
                 float(np.mean(losses)), iou)
        if iou >= best.get("iou", -1.0):
            best["iou"] = iou
            ckpt.save_best("iou", state, best, config)
        ckpt.save_common(state, best, config)
    return {"state": state, "best": best}


def evaluate_classification(state, eval_step, dataset, config) -> float:
    meter = MeterClassification()
    for clouds, labels in dataset.batches(
        config.train.eval_batch_size, seed=0, shuffle=False, drop_last=False
    ):
        logits = eval_step(state, jnp.asarray(clouds))
        meter.update(np.asarray(logits), labels)
    return meter.compute()


def evaluate_registration(config: ExperimentConfig, state=None,
                          model=None) -> dict:
    """Registration evaluation (ref: test_registration, deepgmr_mn40.py:71-97).

    Per pair: per-point features from the frozen trunk -> mutual-NN ->
    robust pose -> RRE/RTE/RMSE meter. If no trained state is supplied, an
    untrained net is initialized (useful for smoke runs).
    """
    log = get_logger(config.name)
    pairs = get_pairs(config.evaluate.pairs_path, config.evaluate.num_points,
                      config.evaluate.pairs_mode, config.evaluate.num_pairs)
    if model is None:
        model = build_model(config)
    if state is None:
        n = config.evaluate.num_points
        dummy = jnp.zeros((1, n, 6), jnp.float32)
        state, _ = create_state(model, config, dummy, 1, seed=config.seed)
    eval_step = make_eval_step(model)
    meter = MeterRegistration()
    key = jax.random.PRNGKey(config.seed)

    for batch in pairs.batches(batch_size=1):
        src = jnp.asarray(batch.source)    # [1, n, 3]
        dst = jnp.asarray(batch.target)
        gt = jnp.asarray(batch.transform)
        # normals on device (ref estimates with Open3D per pair: :55-56)
        n_src = estimate_normals(src)
        n_dst = estimate_normals(dst)
        feat_src = eval_step(state, jnp.concatenate([src, n_src], -1))
        feat_dst = eval_step(state, jnp.concatenate([dst, n_dst], -1))
        t0 = time.time()
        key, sub = jax.random.split(key)
        est, _ = register_pair(
            src[0], dst[0], feat_src[0], feat_dst[0], key=sub,
            method=config.evaluate.method,
            noise_bound=config.evaluate.noise_bound,
            inlier_threshold=config.evaluate.inlier_threshold,
            num_hypotheses=config.evaluate.num_hypotheses,
        )
        est = jax.block_until_ready(est)
        reg_time = time.time() - t0
        errors = pair_errors(src, gt, est[None])
        meter.update(jax.tree_util.tree_map(np.asarray, errors), reg_time)
    results = meter.compute()
    log.info("registration eval [%s/%s]: %s", config.evaluate.pairs_mode,
             config.evaluate.method, results)
    return results

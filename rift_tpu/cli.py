"""Command-line entry points.

Parity with the reference CLI (`train.py:10-18` flags +
`exp_mn40_classify.sh` / `exp_registration.sh` invocations):

  python -m rift_tpu.cli train --preset mn40_sph_dg [a.b=v ...]
  python -m rift_tpu.cli evaluate --preset reg_noise_teaserpp_cu_dg [a.b=v ...]
  python -m rift_tpu.cli presets
"""
from __future__ import annotations

import argparse
import sys

from .train import apply_overrides, evaluate_registration, get_config, presets
from .train import train as run_train


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="rift-tpu")
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="pin the JAX platform (the env var alone cannot override an "
             "auto-registering TPU plugin; this uses jax.config)",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="classification training")
    p_train.add_argument("--preset", default="mn40_sph_dg")
    p_train.add_argument("--no-resume", action="store_true")
    p_train.add_argument("overrides", nargs="*", help="dot-path overrides a.b=v")

    p_eval = sub.add_parser("evaluate", help="registration evaluation")
    p_eval.add_argument("--preset", default="reg_noise_teaserpp_cu_dg")
    p_eval.add_argument("--ckpt", default=None, metavar="DIR",
                        help="checkpoint directory to evaluate "
                             "(ref: --eval_ckpt_pth)")
    p_eval.add_argument("--best", default=None, metavar="METRIC",
                        help="load best_<METRIC> instead of common "
                             "(ref: --best_ckpt_to_test)")
    p_eval.add_argument("--untrained", action="store_true",
                        help="allow evaluating an untrained model "
                             "(smoke runs only)")
    p_eval.add_argument("--methods", default=None,
                        help="comma list -> sweep all methods over ONE "
                             "matching pass (one big compile per mode "
                             "instead of per method); prints "
                             "{method}_{metric} lines")
    p_eval.add_argument("overrides", nargs="*")

    p_ecls = sub.add_parser(
        "evaluate-cls",
        help="classification accuracy + SO(3) rotation-consistency "
             "of a trained checkpoint")
    p_ecls.add_argument("--preset", default="mn40_sph_dg")
    p_ecls.add_argument("--ckpt", default=None, metavar="DIR")
    p_ecls.add_argument("--best", default=None, metavar="METRIC")
    p_ecls.add_argument("--rotations", type=int, default=4,
                        help="rotation copies per cloud for the consistency "
                             "meter (0 disables)")
    p_ecls.add_argument("--no-hard", action="store_true",
                        help="skip the hard-tier pass (calibration probes "
                             "sweep dataset overrides directly)")
    p_ecls.add_argument("--sweep", action="store_true",
                        help="graded corruption sweep (accuracy per level "
                             "+ AUC) — the second ranking axis")
    p_ecls.add_argument("overrides", nargs="*")

    p_map = sub.add_parser(
        "map-sequence",
        help="multi-scan mapping: pairwise registration -> odometry -> "
             "pose graph -> bundle adjustment -> ATE")
    p_map.add_argument("--preset", default="reg_icl_nuim_teaserpp_cu_dg")
    p_map.add_argument("--ckpt", default=None, metavar="DIR")
    p_map.add_argument("--best", default=None, metavar="METRIC")
    p_map.add_argument("--loop-stride", type=int, default=6)
    p_map.add_argument("--landmarks-per-edge", type=int, default=64)
    p_map.add_argument("--mesh", action="store_true",
                       help="shard the pose-graph/BA solves over all devices")
    p_map.add_argument("overrides", nargs="*")

    p_seg = sub.add_parser("train-seg", help="ShapeNet part segmentation")
    p_seg.add_argument("--preset", default="shapenet_seg")
    p_seg.add_argument("overrides", nargs="*")

    sub.add_parser("presets", help="list experiment presets")

    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.command == "presets":
        for name in sorted(presets()):
            print(name)
        return 0

    config = get_config(args.preset)
    apply_overrides(config, args.overrides)
    if args.command == "train":
        run_train(config, resume=not args.no_resume)
        return 0
    if args.command == "evaluate":
        import os

        ckpt_dir = args.ckpt
        ckpt_name = f"best_{args.best}" if args.best else None
        if ckpt_dir is None and not args.untrained:
            # Loud failure instead of silently scoring random weights
            # (ref falls through best -> common -> error, train.py:231-243).
            probe = os.path.join(
                config.train.ckpt_dir, ckpt_name or config.evaluate.ckpt_name)
            if not (config.evaluate.ckpt_dir or os.path.isdir(probe)):
                parser.error(
                    f"no checkpoint at {probe!r}; pass --ckpt DIR / --best "
                    f"METRIC, or --untrained to score random weights")
        if args.methods:
            from .train.loop import evaluate_registration_sweep

            sweep = evaluate_registration_sweep(
                config, args.methods.split(","), ckpt_dir=ckpt_dir,
                ckpt_name=ckpt_name)
            for method, results in sweep.items():
                slug = method.replace("+", "_")
                for key, value in results.items():
                    print(f"{slug}_{key}: {value:.6f}")
            return 0
        results = evaluate_registration(config, ckpt_dir=ckpt_dir,
                                         ckpt_name=ckpt_name)
        for key, value in results.items():
            print(f"{key}: {value:.6f}")
        return 0
    if args.command == "evaluate-cls":
        from .train.loop import evaluate_classification_ckpt

        ckpt_name = f"best_{args.best}" if args.best else None
        results = evaluate_classification_ckpt(
            config, ckpt_dir=args.ckpt, ckpt_name=ckpt_name,
            rotations=args.rotations, hard_tier=not args.no_hard,
            cli_overrides=args.overrides, corruption_sweep=args.sweep)
        for key, value in results.items():
            print(f"{key}: {value:.6f}")
        return 0
    if args.command == "map-sequence":
        from .train.loop import run_map_sequence

        ckpt_name = f"best_{args.best}" if args.best else None
        results = run_map_sequence(
            config, ckpt_dir=args.ckpt, ckpt_name=ckpt_name,
            loop_stride=args.loop_stride,
            landmarks_per_edge=args.landmarks_per_edge, use_mesh=args.mesh)
        for key, value in results.items():
            print(f"{key}: {value:.6f}")
        return 0
    if args.command == "train-seg":
        from .train.loop import train_segmentation

        train_segmentation(config)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

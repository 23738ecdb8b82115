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
    p_eval.add_argument("overrides", nargs="*")

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
        results = evaluate_registration(config)
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

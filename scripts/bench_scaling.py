"""Weak-scaling report for the registration pipeline.

Run on a TPU slice for real ICI numbers, or on CPU with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the sharded program. Prints one JSON line.
"""
from __future__ import annotations

import json


def main() -> None:
    from rift_tpu.parallel.scaling import registration_weak_scaling

    res = registration_weak_scaling()
    out = res.as_dict()
    out["metric"] = "weak-scaling efficiency (registered pairs/s, const work/device)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

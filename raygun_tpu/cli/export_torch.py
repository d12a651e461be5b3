"""``raygun-export-torch``: write a raygun_tpu checkpoint as a reference
(htem/raygun, PyTorch) checkpoint.

Usage::

    raygun-export-torch train_conf.json out.pth               # latest ckpt
    raygun-export-torch train_conf.json out.pth --checkpoint 10000

The output is ``{"model_state_dict": ...}`` with the reference model's
exact key layout, so ``model.load_state_dict(..., strict=True)`` succeeds
on the reference side (its loader: ``systems/BaseSystem.py:114-121``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Export a raygun_tpu checkpoint as a reference torch "
                    "checkpoint"
    )
    parser.add_argument("config", help="train config (JSON)")
    parser.add_argument("out", help="output .pth path")
    parser.add_argument(
        "--checkpoint", default=None,
        help="iteration number or checkpoint path (default: latest)",
    )
    args = parser.parse_args(argv)

    import os

    from ..systems import load_system
    from ..train.export_torch import export_checkpoint
    from ..train.state import latest_checkpoint, load_checkpoint

    system = load_system(args.config)
    system.build_system()
    ckpt = args.checkpoint
    if ckpt is not None and not os.path.exists(str(ckpt)):
        ckpt = f"{system.checkpoint_basename}_checkpoint_{ckpt}"
    if ckpt is None:
        ckpt, _ = latest_checkpoint(system.checkpoint_basename)
        if ckpt is None:
            raise SystemExit(
                f"no checkpoint found under {system.checkpoint_basename}"
            )
    system.state = load_checkpoint(str(ckpt), system.state)
    path = export_checkpoint(system, args.out)
    print(f"exported {ckpt} -> {path}")


if __name__ == "__main__":
    main()

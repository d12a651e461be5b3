"""``raygun-import-torch``: bring a reference (htem/raygun, PyTorch)
checkpoint into this framework.

Usage::

    raygun-import-torch model_checkpoint_10000 train_conf.json
    raygun-import-torch ckpt.pth conf.json --step 5000

Builds the system from the SAME train config the user already has (our
configs are compatible — docs/MIGRATION.md), maps the torch weights onto
the flax param trees (``train/import_torch.py``), and writes a native
checkpoint at the checkpoint's iteration into the config's ``model_path``
so ``raygun-train`` resumes from it and ``raygun-predict`` renders with it.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Import a reference PyTorch checkpoint into raygun_tpu"
    )
    parser.add_argument("checkpoint", help="torch checkpoint file")
    parser.add_argument("config", help="train config (JSON)")
    parser.add_argument(
        "--step", type=int, default=None,
        help="iteration number for the written checkpoint "
             "(default: parsed from the checkpoint filename, else 0)",
    )
    args = parser.parse_args(argv)

    from ..systems import load_system
    from ..train.import_torch import import_checkpoint

    system = load_system(args.config)
    system.build_system()
    path = import_checkpoint(args.checkpoint, system, step=args.step)
    print(f"imported {args.checkpoint} -> {path}")


if __name__ == "__main__":
    main()

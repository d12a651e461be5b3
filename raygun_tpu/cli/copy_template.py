"""raygun-copy-template: copy an experiment folder keeping only configs
(parity: reference src/raygun/copy_template.py:31-51)."""

import os
import shutil
import sys


def copy_template(src: str, dest: str, keep=("_conf.json", "retrain.sh"),
                  exclude_dirs=("models", "snapshots", "tensorboard", "tensorboards")):
    for root, dirs, files in os.walk(src):
        dirs[:] = [d for d in dirs if d not in exclude_dirs and not d.startswith(".")]
        rel = os.path.relpath(root, src)
        out_dir = os.path.join(dest, rel) if rel != "." else dest
        for f in files:
            if any(f.endswith(k) for k in keep):
                os.makedirs(out_dir, exist_ok=True)
                shutil.copy2(os.path.join(root, f), os.path.join(out_dir, f))
    return dest


def main():
    if len(sys.argv) < 3:
        print("usage: raygun-copy-template <src> <dest>", file=sys.stderr)
        sys.exit(1)
    copy_template(sys.argv[1], sys.argv[2])

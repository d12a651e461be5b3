"""raygun-train CLI: config-driven training dispatch.

Parity with reference ``src/raygun/train.py``: ``raygun-train config.json``
dynamically resolves the system named in the config and runs its training;
``batch_train`` walks a folder tree training every ``train_conf.json`` and
symlinks tensorboard dirs into a shared ``tensorboards/``; ``cluster_train``
shells out the config's ``job_command`` (LSF/SLURM submission string) around
``raygun-train``.
"""

from __future__ import annotations

import os
import subprocess
import sys

from ..core.config import read_config
from ..systems import load_system


def _maybe_init_distributed():
    """Multi-host coordination over DCN (SURVEY §5.8: jax.distributed
    replaces daisy's TCP control plane). Triggered by the standard cluster
    env (JAX_COORDINATOR_ADDRESS or a recognized cluster environment);
    single-host runs are untouched."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
            print(
                f"jax.distributed: process {jax.process_index()} of "
                f"{jax.process_count()}"
            )
        except Exception as e:  # pragma: no cover - cluster-env dependent
            print(f"jax.distributed.initialize failed: {e}")


def train(config_path: str):
    """Train the system named in the config (reference ``train.py:52-74``)."""
    _maybe_init_distributed()
    config_path = os.path.abspath(config_path)
    os.chdir(os.path.dirname(config_path))
    system = load_system(config_path)
    system.build_system()
    return system.train()


def cluster_train(config_path: str):
    """Submit via the config's job_command (reference ``train.py:15-49``)."""
    config_path = os.path.abspath(config_path)
    config = read_config(config_path)
    job_command = config.get("job_command")
    if job_command is None:
        return train(config_path)
    if isinstance(job_command, list):
        job_command = " ".join(job_command)
    full = f"{job_command} raygun-train {config_path}"
    print(f"submitting: {full}")
    subprocess.run(full, shell=True, check=True, cwd=os.path.dirname(config_path))


def batch_train(base_folder: str, config_name: str = "train_conf.json",
                tensorboard_dir: str = "tensorboards", use_cluster: bool = False):
    """Recursively train every config under base_folder (reference
    ``train.py:77-148``), skipping output dirs, linking tensorboards."""
    base_folder = os.path.abspath(base_folder)
    skip = {"models", "snapshots", "tensorboard", tensorboard_dir, "__pycache__"}
    tb_root = os.path.join(base_folder, tensorboard_dir)
    os.makedirs(tb_root, exist_ok=True)
    trained = []
    for root, dirs, files in os.walk(base_folder):
        dirs[:] = [d for d in dirs if d not in skip and not d.startswith(".")]
        if config_name in files:
            cfg = os.path.join(root, config_name)
            name = os.path.relpath(root, base_folder).replace(os.sep, "_")
            print(f"=== training {name} ({cfg})")
            cwd = os.getcwd()
            try:
                if use_cluster:
                    cluster_train(cfg)
                else:
                    train(cfg)
            finally:
                os.chdir(cwd)
            run_tb = os.path.join(root, "tensorboard")
            link = os.path.join(tb_root, name)
            if os.path.isdir(run_tb) and not os.path.exists(link):
                os.symlink(run_tb, link)
            trained.append(cfg)
    return trained


def main():
    if len(sys.argv) < 2:
        print("usage: raygun-train <config.json>", file=sys.stderr)
        sys.exit(1)
    train(sys.argv[1])


def batch_main():
    if len(sys.argv) < 2:
        print("usage: raygun-train-batch <folder>", file=sys.stderr)
        sys.exit(1)
    batch_train(sys.argv[1])


def cluster_main():
    if len(sys.argv) < 2:
        print("usage: raygun-train-cluster <config.json>", file=sys.stderr)
        sys.exit(1)
    cluster_train(sys.argv[1])


if __name__ == "__main__":
    main()

"""Production-shape recipe on the real chip (VERDICT r2 #8).

Drives the ieee-isbi-2023 pipeline at the REFERENCE's workload shapes on
synthetic volumes: CycleGAN link training at batch 3x512^2 (reference
``01_cycleGAN/train_conf.json:28-30``), checkpoint selection via smoothed
composite loss (model_logs_bests.json), netG2 whole-volume rendering, MTLSD
training at batch 1x196^3->104^3 with 20 affs + 8 diagonals + 10 LSDs
(reference ``default_MTLSD_conf.json:132-146``), then the validation loop
(blockwise predict -> watershed+agglomerate -> skeleton VOI) emitting
``validation_eval0_metrics.json`` — the BASELINE.md table format, so
quality becomes a table diff, not an assertion.

Real 30/90 nm data is unavailable in this environment (BASELINE.md);
shapes, architectures, and the full artifact chain are production, the
voxels are synthetic. Iteration counts are scaled (config below) to fit a
benchmark session; pass --steps-scale 1.0 for the full 200k/100k schedule.

Usage:
  python scripts/run_production_recipe.py [--out DIR] [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/experiments_out/production_recipe")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes/steps for CPU plumbing validation")
    ap.add_argument("--cyclegan-steps", type=int, default=None)
    ap.add_argument("--mtlsd-steps", type=int, default=None)
    ap.add_argument("--cyclegan-dtype", default="float32",
                    help="train stage 1 in this dtype (bfloat16 halves the "
                         "bandwidth-bound step, docs/PERFORMANCE.md)")
    ap.add_argument("--skip-cyclegan", action="store_true",
                    help="reuse stage-1/2 artifacts already in --out")
    ap.add_argument("--skip-mtlsd", action="store_true",
                    help="reuse stage-3 checkpoints already in --out "
                         "(implies --skip-cyclegan)")
    # HARD synthetic protocol (VERDICT r4 #3): membrane gaps + thin
    # membranes keep segmentation VOI discriminating with training budget
    # (the easy protocol saturates VOI at ~0 by 2k steps). --easy restores
    # the r2-r4 protocol.
    ap.add_argument("--easy", action="store_true",
                    help="use the r2-r4 easy protocol (no membrane gaps)")
    ap.add_argument("--gap-fraction", type=float, default=0.35)
    ap.add_argument("--membrane-sigma", type=float, default=0.6)
    ap.add_argument("--noise", type=float, default=None,
                    help="render noise sigma (default 0.1). The paired "
                         "enhancement claim is noise-limited: a GAN that "
                         "renders A-domain noise has PSNR ceiling "
                         "10*log10(1/(2*noise^2)) — 17.0 dB at 0.1, below "
                         "the blur baseline; 0.05 raises the ceiling to "
                         "23 dB while 3x blur still destroys the "
                         "thin-membrane structure")
    ap.add_argument("--stages", default=None,
                    help="e.g. '12' = run stages 1-2(b) then exit (quick "
                         "paired-enhancement runs)")
    ap.add_argument("--validate-at", default=None,
                    help="comma list of checkpoint steps to run the full "
                         "validation loop at (default: final step only)")
    ap.add_argument("--downstream", action="store_true",
                    help="train MTLSD on netG2-enhanced fake-30nm vs on "
                         "raw-90nm (the reference's Fig-1 comparison) and "
                         "validate both")
    ap.add_argument("--downstream-steps", type=int, default=4000)
    ap.add_argument("--aclsd", action="store_true",
                    help="end-to-end ACLSD leg (train->predict->segment) "
                         "on the same GT volume")
    ap.add_argument("--aclsd-steps", type=int, default=1500)
    args = ap.parse_args()

    raw_kwargs = {} if args.easy else {
        "gap_fraction": args.gap_fraction,
        "membrane_sigma": args.membrane_sigma,
    }
    if args.noise is not None:
        raw_kwargs["noise"] = args.noise

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    print(f"device: {jax.devices()[0]}", flush=True)

    from raygun_tpu.io import make_segmentation_dataset, open_ds
    from raygun_tpu.io.synthetic import make_skeleton_nml
    from raygun_tpu.io.volume import prepare_ds
    from raygun_tpu.core.roi import Coordinate, Roi
    from raygun_tpu.systems import load_system

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    t_start = time.time()

    # per-stage wall times persist across --skip-* resumes so the final
    # summary always carries real steps/s, never NaN
    times_path = os.path.join(out, "stage_times.json")
    stage_times = {}
    if os.path.exists(times_path):
        with open(times_path) as f:
            stage_times = json.load(f)

    def record_time(stage, seconds, steps=None):
        # accumulate across resumes (a resumed train stage only walks the
        # remaining steps; steps/s must divide by steps actually trained)
        stage_times[stage] = stage_times.get(stage, 0.0) + seconds
        if steps is not None:
            stage_times[stage + "_steps"] = (
                stage_times.get(stage + "_steps", 0) + steps)
        with open(times_path, "w") as f:
            json.dump(stage_times, f, indent=2)

    def latest_checkpoint_step(models_dir):
        import re as _re
        best = 0
        if os.path.isdir(models_dir):
            for name in os.listdir(models_dir):
                m = _re.search(r"_checkpoint_(\d+)$", name)
                if m:
                    best = max(best, int(m.group(1)))
        return best

    if args.smoke:
        g_side, g_vol, g_steps, g_save = 64, 160, 8, 4
        m_in, m_out, m_vol, m_steps, m_save = (36,) * 3, (20,) * 3, 64, 6, 3
        m_ngf, m_levels, lsd_sigma, n_diag = 4, 1, 120, 0
        eval_vol = 64
    else:
        # reference workload shapes (BASELINE.md "Hardware & scale context")
        g_side, g_vol, g_steps, g_save = 512, 1536, args.cyclegan_steps or 2000, 250
        m_in, m_out = (196,) * 3, (104,) * 3
        m_vol, m_steps, m_save = 288, args.mtlsd_steps or 2000, 500
        m_ngf, m_levels, lsd_sigma, n_diag = 12, 3, 300, 8
        eval_vol = 256

    # ---- stage 1: CycleGAN link training at 3 x side^2 --------------------
    print("== stage 1: CycleGAN", flush=True)
    from raygun_tpu.io.synthetic import (
        downsample_raw, synthetic_labels, synthetic_raw_from_labels,
    )

    data_path = os.path.join(out, "cyclegan_data.zarr")
    rng_shape = (g_vol, g_vol)
    if args.skip_mtlsd:
        args.skip_cyclegan = True
    skip_cg = args.skip_cyclegan and os.path.isdir(
        os.path.join(out, "01_cycleGAN", "models"))
    if not skip_cg:
        labels_a = synthetic_labels(rng_shape, num_cells=max(24, g_vol // 24), seed=5)
        raw_a = synthetic_raw_from_labels(labels_a, 6, **raw_kwargs)
        labels_b = synthetic_labels(rng_shape, num_cells=max(24, g_vol // 24), seed=11)
        raw_b = downsample_raw(
            synthetic_raw_from_labels(labels_b, 12, **raw_kwargs), 3)
        vx = Coordinate(30, 30)
        roi = Roi((0, 0), Coordinate(rng_shape) * vx)
        prepare_ds(data_path, "raw_30nm", roi, vx, np.uint8, delete=True).write(roi, raw_a)
        prepare_ds(data_path, "raw_90nm_at30", roi, vx, np.uint8, delete=True).write(roi, raw_b)

    cg_dir = os.path.join(out, "01_cycleGAN")
    os.makedirs(cg_dir, exist_ok=True)
    cg_conf = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": data_path, "name": "raw_30nm"},
            "B": {"path": data_path, "name": "raw_90nm_at30"},
        },
        "common_voxel_size": [30, 30],
        "ndims": 2,
        "side_length": g_side,
        "batch_size": 3,
        "loss_type": "link",
        "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 64,
                        "n_blocks": 6 if not args.smoke else 1,
                        "padding_type": "same", "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 64 if not args.smoke else 8,
                        "n_layers": 3, "kw": 3, "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "d_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "model_path": os.path.join(cg_dir, "models") + "/",
        "num_epochs": g_steps,
        "log_every": max(g_steps // 40, 1),
        "save_every": g_save,
        "snapshot_every": None,
        "random_seed": 42,
        "dtype": args.cyclegan_dtype,
    }
    cg_conf_path = os.path.join(cg_dir, "train_conf.json")
    with open(cg_conf_path, "w") as f:
        json.dump(cg_conf, f, indent=2)

    cwd = os.getcwd()
    if skip_cg:
        print("(reusing existing stage-1 artifacts)", flush=True)
        cg_time = stage_times.get("cyclegan", float("nan"))
    else:
        resume_at = latest_checkpoint_step(os.path.join(cg_dir, "models"))
        os.chdir(cg_dir)
        try:
            t0 = time.time()
            system = load_system(cg_conf_path)
            system.build_system()
            system.train()
            record_time("cyclegan", time.time() - t0,
                        steps=g_steps - resume_at)
        finally:
            os.chdir(cwd)
        cg_time = stage_times["cyclegan"]
    cg_steps_timed = stage_times.get("cyclegan_steps", g_steps)
    print(f"CycleGAN: {g_steps} steps at 3x{g_side}^2 in {cg_time:.0f}s "
          f"({cg_steps_timed / cg_time:.2f} steps/s)", flush=True)

    # checkpoint selection: smoothed composite loss (reference
    # inspect_logs -> model_logs_bests.json)
    from raygun_tpu.eval.inspect_logs import inspect_logs

    bests = inspect_logs({"base_folder": cg_dir, "smoothing": 0.9,
                          "plot": False})
    print(f"model_logs_bests: {json.dumps(bests)[:300]}", flush=True)

    # ---- stage 2: render fake volume with netG2 ---------------------------
    print("== stage 2: render netG2", flush=True)
    best_iter = None
    try:
        first = next(iter(bests.values()))
        best_iter = int(first["step"])
        # bests are evaluated at LOG boundaries (every g_steps/40), which
        # need not align with the save grid — snap to the nearest SAVED
        # checkpoint (the reference renders from saved checkpoints too)
        best_iter = max(g_save, round(best_iter / g_save) * g_save)
        ckpt_path = os.path.join(
            cg_dir, "models", f"CycleGAN_checkpoint_{best_iter}")
        if not os.path.exists(ckpt_path):
            best_iter = latest_checkpoint_step(
                os.path.join(cg_dir, "models")) or None
    except Exception:
        pass
    render_conf = {
        "config_path": cg_conf_path,
        "source_path": data_path,
        "source_dataset": "raw_90nm_at30",
        "net_name": "netG2",
        "checkpoint": best_iter,
        "input_shape": g_side,
        "output_shape": g_side,
        "output_ds": ["fake_30nm"],
        "out_specs": {"fake": {"dtype": "uint8"}},
        "dest_path": data_path,
    }
    rp = os.path.join(cg_dir, "render_conf.json")
    with open(rp, "w") as f:
        json.dump(render_conf, f, indent=2)
    from raygun_tpu.cli.predict import predict as predict_cli

    if not skip_cg:
        t0 = time.time()
        predict_cli(rp)
        print(f"rendered fake_30nm in {time.time() - t0:.0f}s", flush=True)

    from raygun_tpu.eval.image_metrics import images_compare

    img_metrics = images_compare({
        "target_source": {"path": data_path, "ds": "raw_30nm"},
        "test_sources": {"fake_30nm": {"path": data_path, "ds": "fake_30nm"},
                         "raw_90nm": {"path": data_path, "ds": "raw_90nm_at30"}},
        "metrics_path": os.path.join(out, "compare_30nm_metrics.json"),
    })
    print(f"image metrics (fake vs real 30nm, UNPAIRED volumes — the "
          f"reference's full-volume table, where its fake also loses): "
          f"{img_metrics}", flush=True)

    # ---- stage 2b: PAIRED enhancement comparison --------------------------
    # The reference's headline Fig-1 image claim (compare_90nm_metrics_
    # crop64.json: link PSNR 21.8-22.7 vs raw-90nm 19.2) is measured on
    # REGISTERED 30/90nm acquisitions of the SAME tissue. The unpaired
    # table above compares different random volumes and cannot show it
    # (VERDICT r4 missing #2). Paired analog: one held-out volume rendered
    # at 30nm, degraded to 90nm by the same acquisition model, enhanced by
    # netG2 — fake vs its own ground truth.
    print("== stage 2b: paired enhancement eval", flush=True)
    if not skip_cg:
        labels_p = synthetic_labels(rng_shape, num_cells=max(24, g_vol // 24),
                                    seed=23)
        raw_p30 = synthetic_raw_from_labels(labels_p, 24, **raw_kwargs)
        # the 90nm acquisition of the SAME structure with INDEPENDENT
        # acquisition noise (a different render seed), exactly how the
        # training B-domain is made. Downsampling the target image itself
        # would leak the target's own noise into raw_90nm (correlated
        # errors), unfairly flattering the blur baseline — two real
        # acquisitions never share noise.
        raw_p90 = downsample_raw(
            synthetic_raw_from_labels(labels_p, 25, **raw_kwargs), 3)
        vx = Coordinate(30, 30)
        roi = Roi((0, 0), Coordinate(rng_shape) * vx)
        prepare_ds(data_path, "pair_real_30nm", roi, vx, np.uint8,
                   delete=True).write(roi, raw_p30)
        prepare_ds(data_path, "pair_raw_90nm", roi, vx, np.uint8,
                   delete=True).write(roi, raw_p90)
        pair_render = dict(render_conf, source_dataset="pair_raw_90nm",
                           output_ds=["pair_fake_30nm"])
        prp = os.path.join(cg_dir, "render_pair_conf.json")
        with open(prp, "w") as f:
            json.dump(pair_render, f, indent=2)
        t0 = time.time()
        predict_cli(prp)
        print(f"rendered pair_fake_30nm in {time.time() - t0:.0f}s", flush=True)
    paired_metrics = images_compare({
        "target_source": {"path": data_path, "ds": "pair_real_30nm"},
        "test_sources": {
            "fake_30nm": {"path": data_path, "ds": "pair_fake_30nm"},
            "raw_90nm": {"path": data_path, "ds": "pair_raw_90nm"},
        },
        # the reference's artifact crops 64 px off each border
        # (compare_90nm_metrics_crop64.json) — same here, which also
        # excludes blockwise-render edge effects
        "crop": 64,
        "metrics_path": os.path.join(out, "compare_90nm_metrics_paired.json"),
    })
    print(f"PAIRED image metrics (same volume, fake vs raw-90nm against "
          f"real-30nm): {paired_metrics}", flush=True)
    if args.stages and "3" not in args.stages:
        summary = {
            "workload": f"CycleGAN 3x{g_side}^2 {g_steps} steps "
                        f"(stages {args.stages})",
            "protocol": ("easy" if args.easy else dict(raw_kwargs)),
            "image_metrics_unpaired": img_metrics,
            "image_metrics_paired_crop64": paired_metrics,
            "total_wall_s": round(time.time() - t_start, 0),
        }
        with open(os.path.join(out, "recipe_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary, indent=2), flush=True)
        return

    # ---- stage 3: MTLSD training at 196^3 -> 104^3 ------------------------
    print("== stage 3: MTLSD", flush=True)
    gt_path = os.path.join(out, "mtlsd_gt.zarr")
    skip_mt = args.skip_mtlsd and os.path.isdir(
        os.path.join(out, "02_MTLSD", "models"))
    if skip_mt:
        src = {"path": gt_path, "raw": "volumes/raw",
               "labels": "volumes/labels", "labels_mask": "volumes/labels_mask",
               "cell_mask": "volumes/cell_mask"}
    else:
        src = make_segmentation_dataset(
            gt_path, shape=(m_vol,) * 3, num_cells=24 if not args.smoke else 10,
            seed=17, **raw_kwargs)

    mt_dir = os.path.join(out, "02_MTLSD")
    os.makedirs(mt_dir, exist_ok=True)
    mt_conf = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": list(m_in), "output_shape": list(m_out),
        "voxel_size": [30, 30, 30],
        "num_affs": 20 if not args.smoke else 3,
        "neighborhood": None if not args.smoke else [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": n_diag,
        "model_kwargs": {"unet_kwargs": {
            "input_nc": 1, "ngf": m_ngf, "fmap_inc_factor": 6 if not args.smoke else 2,
            "downsample_factors": [[2, 2, 2]] * m_levels,
            "constant_upsample": True,
        }, "num_affs": 20 if not args.smoke else 3},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": {"scale_min": 0.9, "scale_max": 1.1,
                                 "shift_min": -0.1, "shift_max": 0.1},
        "lsd_kwargs": {"sigma": lsd_sigma, "downsample": 2},
        "max_labels": 32,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 5e-4},
        "model_path": os.path.join(mt_dir, "models") + "/",
        "train_kwargs": {"log_dir": os.path.join(mt_dir, "tb"),
                         "log_every": max(m_steps // 40, 1),
                         "num_epochs": m_steps, "save_every": m_save},
        "random_seed": 13,
    }
    if not args.smoke:
        mt_conf.pop("neighborhood")
        mt_conf.pop("num_affs")
    mt_conf_path = os.path.join(mt_dir, "train_conf.json")
    with open(mt_conf_path, "w") as f:
        json.dump(mt_conf, f, indent=2)
    if skip_mt:
        print("(reusing existing stage-3 checkpoints)", flush=True)
        mt_time = stage_times.get("mtlsd", float("nan"))
    else:
        resume_at = latest_checkpoint_step(os.path.join(mt_dir, "models"))
        os.chdir(mt_dir)
        try:
            t0 = time.time()
            system = load_system(mt_conf_path)
            system.build_system()
            system.train()
            record_time("mtlsd", time.time() - t0,
                        steps=m_steps - resume_at)
        finally:
            os.chdir(cwd)
        mt_time = stage_times["mtlsd"]
    mt_steps_timed = stage_times.get("mtlsd_steps", m_steps)
    print(f"MTLSD: {m_steps} steps at 1x{m_in[0]}^3 in {mt_time:.0f}s "
          f"({mt_steps_timed / mt_time:.2f} steps/s)", flush=True)

    # ---- stage 4: validation loop on a held-out synthetic volume ----------
    print("== stage 4: validation (predict -> segment -> skeleton VOI)",
          flush=True)
    ev_path = os.path.join(out, "eval0.zarr")
    ev = make_segmentation_dataset(
        ev_path, shape=(eval_vol,) * 3, num_cells=20 if not args.smoke else 10,
        seed=99, **raw_kwargs)
    ev_labels = open_ds(ev["path"], ev["labels"]).read()
    nml = make_skeleton_nml(ev_labels, os.path.join(out, "skel.nml"),
                            n_trees=24)
    n_affs = 3 if args.smoke else 20
    validate_at = (
        [int(s) for s in args.validate_at.split(",")]
        if args.validate_at else [m_steps]
    )

    from raygun_tpu.eval.validate import validate_affinities

    def run_validation_loop(conf_path, ckpt, metric_name, in_shape, out_shape,
                            source_dataset=None, tag="", output_ds=None,
                            aff_ds="volumes/pred_affs"):
        """Full predict -> segment -> skeleton-VOI loop for one checkpoint;
        appends {ckpt: metrics} to metric_name and returns the entry."""
        predict_conf = {
            "config_path": conf_path,
            "source_path": ev["path"],
            "source_dataset": source_dataset or ev["raw"],
            "checkpoint": ckpt,
            "scaleShift_input": [2, -1],
            "output_ds": output_ds or ["volumes/pred_affs",
                                       "volumes/pred_lsds"],
            "input_shape": list(in_shape), "output_shape": list(out_shape),
            "dest_path": ev["path"],
        }
        val_conf = {
            "checkpoint": ckpt,
            "metric_path": os.path.join(out, metric_name),
            "prediction_config_path": os.path.join(
                out, f"predict_conf{tag}.json"),
            "segment_config": {
                "file": ev["path"], "aff_ds": aff_ds,
                "thresholds": [0.5], "save": True,
            },
            "skeleton_config": {
                "file": ev["path"], "skeleton_path": nml,
                "dataset": "skeleton_rasterization",
                "shape": [eval_vol] * 3, "voxel_size": [30, 30, 30],
            },
        }
        with open(val_conf["prediction_config_path"], "w") as f:
            json.dump(predict_conf, f, indent=2)
        vp = os.path.join(out, f"val_conf{tag}.json")
        with open(vp, "w") as f:
            json.dump(val_conf, f, indent=2)
        t0 = time.time()
        validate_affinities(vp)
        print(f"validation loop ({metric_name} @{ckpt}) in "
              f"{time.time() - t0:.0f}s", flush=True)
        return json.load(open(val_conf["metric_path"]))[str(ckpt)]

    # checkpoint sweep: the BASELINE.md table shape (score per step) AND
    # the learning-direction evidence the easy protocol could not give
    # (VERDICT r4: VOI saturated at 0.0022 from 2k steps)
    entries = {}
    for ckpt in validate_at:
        entries[ckpt] = run_validation_loop(
            mt_conf_path, ckpt, "validation_eval0_metrics.json", m_in, m_out)
    entry = entries[validate_at[-1]]
    score = entry["voi_split"] + entry["voi_merge"]
    voi_by_step = {
        str(c): round(e["voi_split"] + e["voi_merge"], 4)
        for c, e in entries.items()
    }
    print(f"VOI by checkpoint: {voi_by_step}", flush=True)

    summary = {
        "workload": f"CycleGAN 3x{g_side}^2 {g_steps} steps; "
                    f"MTLSD 1x{m_in[0]}^3 {m_steps} steps",
        "protocol": ("easy" if args.easy else
                     {"gap_fraction": args.gap_fraction,
                      "membrane_sigma": args.membrane_sigma}),
        "cyclegan_steps_per_sec": round(cg_steps_timed / cg_time, 3),
        "mtlsd_steps_per_sec": round(mt_steps_timed / mt_time, 3),
        "image_metrics_unpaired": img_metrics,
        "image_metrics_paired_crop64": paired_metrics,
        "validation": entry,
        "voi_by_step": voi_by_step,
        "score_voi_sum": round(score, 4),
    }
    if len(validate_at) > 1:
        summary["voi_learning_direction_ok"] = bool(
            voi_by_step[str(validate_at[-1])] < voi_by_step[str(validate_at[0])]
        )

    # interim summary: the core evidence (VOI sweep + image tables) lands
    # even if the optional downstream/ACLSD stages are cut short
    summary["total_wall_s"] = round(time.time() - t_start, 0)
    with open(os.path.join(out, "recipe_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # ---- stage 5 (optional): downstream fake-30nm vs raw-90nm -------------
    # The reference's Fig-1 DOWNSTREAM result (BASELINE.md: link 4.52 beats
    # real_90nm 4.61 on validation VOI): train one MTLSD on the netG2-
    # ENHANCED version of the GT volume's 90nm acquisition and one on the
    # raw 90nm itself; validate each on the eval volume acquired the same
    # way. Reference 02_MTLSD trains exactly these variant legs.
    if args.downstream:
        summary["downstream"] = _downstream_legs(
            args, out, mt_conf, ev, cg_conf_path, best_iter,
            run_validation_loop, m_in, m_out, record_time)

    # ---- stage 6 (optional): ACLSD end-to-end leg -------------------------
    if args.aclsd:
        summary["aclsd"] = _aclsd_leg(
            args, out, src, run_validation_loop, record_time)

    summary["total_wall_s"] = round(time.time() - t_start, 0)
    with open(os.path.join(out, "recipe_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


def _train_leg(conf, conf_path, steps, record_time, time_key):
    """Train one system config (resumable) and record wall time."""
    import time as _time

    from raygun_tpu.systems import load_system

    leg_dir = os.path.dirname(conf_path)
    os.makedirs(leg_dir, exist_ok=True)
    with open(conf_path, "w") as f:
        json.dump(conf, f, indent=2)
    models_dir = conf["model_path"].rstrip("/")
    import re as _re
    done = 0
    if os.path.isdir(models_dir):
        for name in os.listdir(models_dir):
            m = _re.search(r"_checkpoint_(\d+)$", name)
            if m:
                done = max(done, int(m.group(1)))
    if done >= steps:
        print(f"({time_key}: reusing checkpoint {done})", flush=True)
        return
    cwd = os.getcwd()
    os.chdir(leg_dir)
    try:
        t0 = _time.time()
        system = load_system(conf_path)
        system.build_system()
        system.train()
        record_time(time_key, _time.time() - t0, steps=steps - done)
    finally:
        os.chdir(cwd)


def _downstream_legs(args, out, mt_conf, ev, cg_conf_path,
                     best_iter, run_validation_loop, m_in, m_out,
                     record_time):
    """Reference Fig-1 downstream comparison (BASELINE.md: link 4.52 beats
    real_90nm 4.61): MTLSD trained on netG2-ENHANCED 90nm vs on raw 90nm,
    each validated on the eval volume acquired/enhanced the same way."""
    import numpy as np

    from raygun_tpu.cli.predict import predict as predict_cli
    from raygun_tpu.core.roi import Coordinate, Roi
    from raygun_tpu.io import open_ds
    from raygun_tpu.io.synthetic import downsample_raw
    from raygun_tpu.io.volume import prepare_ds

    print("== stage 5: downstream fake-30nm vs raw-90nm", flush=True)
    ds_dir = os.path.join(out, "03_downstream")
    os.makedirs(ds_dir, exist_ok=True)

    # 90nm acquisition + netG2 enhancement of BOTH the GT and eval volumes
    for path, raw_ds in ((mt_conf["sources"][0]["path"],
                          mt_conf["sources"][0]["raw"]),
                         (ev["path"], ev["raw"])):
        vol = open_ds(path, raw_ds)
        if not os.path.isdir(os.path.join(path, "volumes/fake_30nm")):
            raw30 = vol.read()
            raw90 = downsample_raw(raw30, 3)
            prepare_ds(path, "volumes/raw_90nm", vol.roi, vol.voxel_size,
                       np.uint8, delete=True).write(vol.roi, raw90)
            side = int(raw30.shape[-1])
            render = {
                "config_path": cg_conf_path,
                "source_path": path,
                "source_dataset": "volumes/raw_90nm",
                "net_name": "netG2",
                "checkpoint": best_iter,
                "input_shape": side, "output_shape": side, "ndims": 2,
                "output_ds": ["volumes/fake_30nm"],
                "out_specs": {"fake": {"dtype": "uint8"}},
                "dest_path": path,
            }
            rp = os.path.join(ds_dir, "render_" + os.path.basename(path)
                              + ".json")
            with open(rp, "w") as f:
                json.dump(render, f, indent=2)
            predict_cli(rp)
            print(f"enhanced {path} -> volumes/fake_30nm", flush=True)

    results = {}
    for leg, train_raw, eval_raw in (
        ("link", "volumes/fake_30nm", "volumes/fake_30nm"),
        ("real90", "volumes/raw_90nm", "volumes/raw_90nm"),
    ):
        conf = json.loads(json.dumps(mt_conf))  # deep copy
        conf["sources"][0]["raw"] = train_raw
        conf["model_path"] = os.path.join(ds_dir, leg, "models") + "/"
        tk = dict(conf["train_kwargs"])
        tk["log_dir"] = os.path.join(ds_dir, leg, "tb")
        tk["num_epochs"] = args.downstream_steps
        tk["save_every"] = args.downstream_steps
        tk["log_every"] = max(args.downstream_steps // 20, 1)
        conf["train_kwargs"] = tk
        _train_leg(conf, os.path.join(ds_dir, leg, "train_conf.json"),
                   args.downstream_steps, record_time, f"downstream_{leg}")
        entry = run_validation_loop(
            os.path.join(ds_dir, leg, "train_conf.json"),
            args.downstream_steps,
            f"validation_eval0_metrics_{leg}.json", m_in, m_out,
            source_dataset=eval_raw, tag=f"_{leg}")
        results[leg] = {
            "voi_sum": round(entry["voi_split"] + entry["voi_merge"], 4),
            "metrics": entry,
        }
    results["link_beats_real90"] = bool(
        results["link"]["voi_sum"] < results["real90"]["voi_sum"]
    )
    print(f"downstream: link {results['link']['voi_sum']} vs real90 "
          f"{results['real90']['voi_sum']}", flush=True)
    return results


def _aclsd_leg(args, out, src, run_validation_loop, record_time):
    """End-to-end ACLSD leg (VERDICT r4 weak #6): train the auto-context
    system on the same GT volume, predict, segment on the AC affinities."""
    print("== stage 6: ACLSD end-to-end", flush=True)
    ac_dir = os.path.join(out, "04_ACLSD")
    if args.smoke:
        in_sh, out_sh = [36] * 3, [20] * 3
        mt_unet = {"input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
                   "downsample_factors": [[2, 2, 2]],
                   "constant_upsample": True}
        ac_unet = {"input_nc": 10, "ngf": 4, "fmap_inc_factor": 2,
                   "downsample_factors": [[2, 2, 2]],
                   "constant_upsample": True, "padding_type": "same"}
        num_affs, n_diag, sigma = 3, 0, 120
        neighborhood = [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
    else:
        in_sh, out_sh = [196] * 3, [104] * 3
        mt_unet = {"input_nc": 1, "ngf": 12, "fmap_inc_factor": 6,
                   "downsample_factors": [[2, 2, 2]] * 3,
                   "constant_upsample": True}
        ac_unet = {"input_nc": 10, "ngf": 12, "fmap_inc_factor": 6,
                   "downsample_factors": [[2, 2, 2]] * 3,
                   "constant_upsample": True, "padding_type": "same"}
        num_affs, n_diag, sigma = 20, 8, 300
        neighborhood = None
    conf = {
        "system": "ACLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": in_sh, "output_shape": out_sh,
        "voxel_size": [30, 30, 30],
        "n_diagonals": n_diag,
        "model_kwargs": {"mt_unet_kwargs": mt_unet,
                         "ac_unet_kwargs": ac_unet,
                         "num_affs": num_affs},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": {"scale_min": 0.9, "scale_max": 1.1,
                                 "shift_min": -0.1, "shift_max": 0.1},
        "lsd_kwargs": {"sigma": sigma, "downsample": 2},
        "max_labels": 32,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 5e-4},
        "model_path": os.path.join(ac_dir, "models") + "/",
        "train_kwargs": {"log_dir": os.path.join(ac_dir, "tb"),
                         "log_every": max(args.aclsd_steps // 20, 1),
                         "num_epochs": args.aclsd_steps,
                         "save_every": args.aclsd_steps},
        "random_seed": 13,
    }
    if neighborhood is not None:
        conf["neighborhood"] = neighborhood
        conf["num_affs"] = num_affs
    _train_leg(conf, os.path.join(ac_dir, "train_conf.json"),
               args.aclsd_steps, record_time, "aclsd")
    entry = run_validation_loop(
        os.path.join(ac_dir, "train_conf.json"), args.aclsd_steps,
        "validation_eval0_metrics_aclsd.json", in_sh, out_sh,
        tag="_aclsd",
        output_ds=["volumes/pred_affs", "volumes/pred_lsds",
                   "volumes/pred_affs_ac"],
        aff_ds="volumes/pred_affs_ac")
    return {
        "voi_sum": round(entry["voi_split"] + entry["voi_merge"], 4),
        "metrics": entry,
    }


if __name__ == "__main__":
    main()

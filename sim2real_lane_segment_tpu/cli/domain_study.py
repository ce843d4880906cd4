"""End-to-end domain-adaptation study — the reference's experimental
design as one reproducible command.

Generates a source domain and an appearance-shifted target domain
(different map + global color shift + different DR seed), then trains
and evaluates the adaptation regimes on the target test split.  Both
domains render through the same fisheye distortion — in the reference
both sim recordings (learning/utils/env.py:4-23, distortion=True) and
the real Duckiebot camera are fisheye, so the sim2real gap is
appearance, not geometry (HM/CycleGAN/MME address appearance):

  baseline  — source-only supervised training
  st        — source + small labelled target subset (50/50 sampling)
  hm        — histogram-matched source + S&T training
  cyclegan  — CycleGAN trained in-framework on the unpaired domains
              (train/cyclegan.py), source restyled, then S&T training
  mme       — minimax-entropy SSDA from the baseline weights

Writes a JSON summary of target-domain metrics per regime.  Runs
anywhere JAX runs; sized for a single TPU chip in tens of minutes with
``--arch lite``.
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import shutil
import time

import numpy as np

from . import common

log = logging.getLogger(__name__)


def _record_domain(out_dir: str, map_name: str, *, seed: int, episodes: int,
                   steps: int, distortion: bool, color_shift=None,
                   texture_pack=None, noise_sigma=None) -> None:
    import cv2
    import jax

    from ..cli import postprocess, preprocess_db
    from ..data.videoio import AsyncVideoWriter
    from ..sim import lanes, render, rollout
    from ..sim.maps import builtin_map

    if os.path.exists(os.path.join(out_dir, "train")):
        log.info("%s cached", out_dir)
        return
    m = builtin_map(map_name)
    scene = render.build_scene(m, seed=seed, texture_pack=texture_pack)
    la = lanes.build_lane_arrays(m)
    rng = np.random.default_rng(seed)
    rec = out_dir + "_rec"
    os.makedirs(rec, exist_ok=True)
    key = jax.random.key(seed)
    for seq in range(episodes):
        pos, angle = rollout.sample_spawns(m, la, rng, 1)
        with AsyncVideoWriter(f"{rec}/{seq:03d}_orig.avi",
                              frame_size=(640, 480)) as wo, \
                AsyncVideoWriter(f"{rec}/{seq:03d}_annot.avi",
                                 frame_size=(640, 480)) as wa:
            done = 0
            while done < steps:
                key, k = jax.random.split(key)
                batch = rollout.expert_rollout(
                    scene, la, k, pos, angle, tile_size=m.tile_size,
                    n_steps=24, height=480, width=640, distortion=distortion,
                    procedural=texture_pack is None)
                wo.write(np.asarray(batch.orig)[:, 0, :, :, ::-1])
                wa.write(np.asarray(batch.annot)[:, 0, :, :, ::-1])
                pos, angle = batch.pos[-1], batch.angle[-1]
                done += 24
        log.info("%s: episode %d rendered", map_name, seq)
    raw = out_dir + "_raw"
    postprocess.main(["-id", rec, "-od", raw])
    preprocess_db.main(["--dbType", "sim", "--dataPath", raw])
    if color_shift is not None or noise_sigma:
        png_rng = np.random.default_rng(seed + 77)
        for split in ("train", "valid", "test"):
            for p in sorted(glob.glob(f"{raw}/{split}/input/*.png")):
                img = cv2.imread(p).astype(np.float32)
                if color_shift is not None:
                    scale, shift = color_shift
                    img = img * np.asarray(scale) + shift
                if noise_sigma:
                    # per-frame sensor noise (shot/read noise proxy): the
                    # real camera's grain the sim lacks
                    img = img + png_rng.normal(0.0, noise_sigma, img.shape)
                cv2.imwrite(p, np.clip(img, 0, 255).astype(np.uint8))
    os.rename(raw, out_dir)


def _build_tree(root: str, src: str, tgt: str, n_labelled: int,
                hm: bool) -> str:
    from ..cli import hist_match

    shutil.rmtree(root, ignore_errors=True)

    def cp(pairs, dst, labelled=True):
        os.makedirs(f"{root}/{dst}/input", exist_ok=True)
        if labelled:
            os.makedirs(f"{root}/{dst}/label", exist_ok=True)
        for k, ip in enumerate(pairs):
            shutil.copy(ip, f"{root}/{dst}/input/{k:06d}.png")
            if labelled:
                shutil.copy(ip.replace("input", "label"),
                            f"{root}/{dst}/label/{k:06d}.png")

    src_train = sorted(glob.glob(f"{src}/train/input/*.png"))
    tgt_train = sorted(glob.glob(f"{tgt}/train/input/*.png"))
    tgt_valid = sorted(glob.glob(f"{tgt}/valid/input/*.png"))
    tgt_test = sorted(glob.glob(f"{tgt}/test/input/*.png"))
    cp(src_train, "source")
    cp(tgt_train[:n_labelled], "target/train")
    cp(tgt_train + tgt_valid, "target/unlabelled", labelled=False)
    cp(tgt_test, "target/test")
    if hm:
        hist_match.main(["--ds_source", f"{root}/source",
                         "--ds_reference", f"{root}/target/unlabelled",
                         "--batch_size", "16"])
    return root


def main(args=None) -> dict:
    common.setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="domain_study")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--steps", type=int, default=144)
    p.add_argument("--n_labelled", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--arch", default="lite",
                   choices=["67", "67r", "57", "103", "tiny", "lite", "encdec"])
    p.add_argument("--source-map", default="loop_empty")
    p.add_argument("--target-map", default="zigzag")
    p.add_argument("--target_texture_pack", default=None,
                   help="render the TARGET domain through a photographic "
                        "texture pack instead of the procedural shader: a "
                        "pack directory, or 'auto' to generate one "
                        "(sim/textures.generate_photo_pack) — the closest "
                        "in-environment proxy for the real camera domain")
    p.add_argument("--target_noise", type=float, default=0.0,
                   help="gaussian sensor-noise sigma added to target "
                        "input frames (real-camera grain proxy)")
    p.add_argument("--regimes", nargs="+",
                   default=["baseline", "st", "hm", "cyclegan", "mme"])
    p.add_argument("--batch_size", "-b", type=int, default=32,
                   help="train batch size (reference recipe: 64)")
    p.add_argument("--cg_batch", type=int, default=4,
                   help="CycleGAN training batch size")
    p.add_argument("--device_cache", action="store_true",
                   help="HBM-resident splits + on-device batch gather "
                        "(data/device_cache.py)")
    p.add_argument("--cg_epochs", type=int, default=30,
                   help="CycleGAN training epochs for the cyclegan regime")
    p.add_argument("--distill", action="store_true",
                   help="after the regimes, distill a LaneNetLite student "
                        "from each regime's best teacher on that regime's "
                        "training tree and evaluate it on the same target "
                        "test split — the bridge that lets the 65k-fps "
                        "serving student carry each adapted teacher's "
                        "accuracy (rows student_<regime> in the summary)")
    p.add_argument("--distill_epochs", type=int, default=None,
                   help="distillation budget per student (default: "
                        "--epochs).  The round-3 40-epoch students were "
                        "still climbing at their cutoff; the 30x-smaller "
                        "student needs a longer soft-target budget than "
                        "its teacher's supervised fit")
    p.add_argument("--force", action="store_true",
                   help="retrain regimes even if a finished result exists "
                        "in the workdir (default: resume — skip regimes "
                        "already in study_summary.json, reload weights of "
                        "regimes that trained but crashed before summary, "
                        "and continue a fit that crashed mid-run from its "
                        "last checkpoint)")
    args = p.parse_args(args)
    common.setup_runtime()

    import jax

    from ..data.modules import (SimulatorDataModule, TwoDomainDataModule,
                                TwoDomainMMEDataModule)
    from ..train.loop import fit, run_eval
    from ..train.mme import MMETrainer
    from ..train.supervised import SupervisedTrainer
    from .test import build_model

    os.makedirs(args.workdir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(args.workdir)
    try:
        _record_domain("sourceData", args.source_map, seed=0,
                       episodes=args.episodes, steps=args.steps,
                       distortion=True)
        pack = args.target_texture_pack
        if pack == "auto":
            from ..sim.textures import generate_photo_pack
            pack = generate_photo_pack("photo_pack", seed=9)
        _record_domain("targetData", args.target_map, seed=9,
                       episodes=args.episodes, steps=args.steps,
                       distortion=True, texture_pack=pack,
                       noise_sigma=args.target_noise,
                       # the color shift models a camera white-balance
                       # offset; with a texture pack the appearance shift
                       # comes from the photographic tiles themselves
                       color_shift=(None if pack else
                                    ((1.05, 0.85, 0.7), -12)))

        kw = lambda: dict(num_cls=4, augment=True, lr=args.lr,
                          model=build_model(args.arch, 4))
        results: dict = {}
        if os.path.exists("study_summary.json") and not args.force:
            with open("study_summary.json") as f:
                results = json.load(f)
            log.info("resuming: %s already in study_summary.json",
                     sorted(results) or "nothing")
        b_state = None

        def save_summary():
            # written after every regime so a crash mid-study (the chip is
            # a shared relay — pressure spikes happen) loses one regime at
            # most, not the whole multi-hour matrix
            with open("study_summary.json", "w") as f:
                json.dump(results, f, indent=2)

        def restore(name, trainer):
            """Best weights of a regime that already trained, or None."""
            from ..train.checkpoint import load_weights
            p = f"results/{name}/best_weights.msgpack"
            if args.force or not os.path.exists(p):
                return None
            log.info("%s: restoring %s", name, p)
            return load_weights(p, trainer.init_state(jax.random.key(0)))

        def regime_cache(name):
            """device_cache for a regime, persisted across crash-restarts.

            The in-process relief valve (train/loop.py) frees device
            caches under HBM pressure — but a process that crashes anyway
            (babysitter restart) would re-upload them and repeat the OOM.
            Count the entries into each regime in its workdir; from the
            third attempt on, train that regime without device caches."""
            if not args.device_cache:
                return False
            os.makedirs(f"results/{name}", exist_ok=True)
            marker = f"results/{name}/cache_attempts.txt"
            tries = 0
            if os.path.exists(marker):
                with open(marker) as f:
                    tries = int(f.read().strip() or 0)
            with open(marker, "w") as f:
                f.write(str(tries + 1))
            if tries >= 2:
                log.warning("%s: %d prior attempts crashed; disabling the "
                            "device cache for this regime", name, tries)
                return False
            return True

        def target_test_batches():
            tgt = SimulatorDataModule(data_path="targetData",
                                      batch_size=args.batch_size, seed=42)
            tgt.setup()
            return tgt.test_batches()

        if "baseline" in args.regimes or "mme" in args.regimes:
            t0 = time.time()
            base = SupervisedTrainer(**kw())
            b_state = restore("baseline", base)
            if b_state is None:
                data = SimulatorDataModule(data_path="sourceData", batch_size=args.batch_size,
                                           seed=42, load_into_memory=True,
                                           device_cache=regime_cache("baseline"))
                data.setup()
                b_state, _, _ = fit(base, base.init_state(jax.random.key(0)),
                                    data, max_epochs=args.epochs,
                                    out_dir="results/baseline",
                                    resume=not args.force)
            if "baseline" not in results or args.force:
                results["baseline"] = run_eval(base.eval_step, b_state,
                                               target_test_batches())
                save_summary()
                log.info("baseline: %s (%.0fs)", results["baseline"],
                         time.time() - t0)

        for name in ("st", "hm"):
            if name not in args.regimes:
                continue
            if name in results and not args.force:
                log.info("%s: cached in study_summary.json", name)
                continue
            t0 = time.time()
            tr = SupervisedTrainer(**kw())
            s = restore(name, tr)
            if s is None:
                root = _build_tree(f"srd_{name}", "sourceData", "targetData",
                                   args.n_labelled, hm=(name == "hm"))
                data = TwoDomainDataModule(data_path=root, batch_size=args.batch_size,
                                           seed=42, load_into_memory=True,
                                           device_cache=regime_cache(name))
                data.setup()
                s, _, _ = fit(tr, tr.init_state(jax.random.key(1)), data,
                              max_epochs=args.epochs, out_dir=f"results/{name}",
                              resume=not args.force)
            # every regime tests on the same target test images (the
            # srd_* trees copy targetData/test verbatim), so the restored
            # path can evaluate without rebuilding the tree
            results[name] = run_eval(tr.eval_step, s, target_test_batches())
            save_summary()
            log.info("%s: %s (%.0fs)", name, results[name], time.time() - t0)

        if "cyclegan" in args.regimes and not (
                "cyclegan" in results and not args.force):
            t0 = time.time()
            tr = SupervisedTrainer(**kw())
            s = restore("cyclegan", tr)
            if s is None:
                from ..cli import sim2real_convert, train_cyclegan
                root = _build_tree("srd_cg", "sourceData", "targetData",
                                   args.n_labelled, hm=False)
                train_cyclegan.main([
                    "--source_dir", f"{root}/source/input",
                    "--target_dir", f"{root}/target/unlabelled/input",
                    "--out", "results/cyclegan_gen",
                    "--epochs", str(args.cg_epochs), "-b", str(args.cg_batch)])
                # restyle the source inputs in place, then train like S&T
                sim2real_convert.main([
                    "--dataPath", f"{root}/source",
                    "--modelWeightsPath", "results/cyclegan_gen/g_ab.msgpack"])
                data = TwoDomainDataModule(data_path=root, batch_size=args.batch_size,
                                           seed=42, load_into_memory=True,
                                           device_cache=regime_cache("cyclegan"))
                data.setup()
                s, _, _ = fit(tr, tr.init_state(jax.random.key(2)), data,
                              max_epochs=args.epochs,
                              out_dir="results/cyclegan",
                              resume=not args.force)
            results["cyclegan"] = run_eval(tr.eval_step, s,
                                           target_test_batches())
            save_summary()
            log.info("cyclegan: %s (%.0fs)", results["cyclegan"],
                     time.time() - t0)
        elif "cyclegan" in args.regimes:
            log.info("cyclegan: cached in study_summary.json")

        if "mme" in args.regimes and not ("mme" in results and not args.force):
            t0 = time.time()
            mme = MMETrainer(**kw())
            m_best = restore("mme", mme)
            if m_best is None:
                root = _build_tree("srd_mme", "sourceData", "targetData",
                                   args.n_labelled, hm=False)
                m_state = mme.init_state(jax.random.key(3))
                m_state = m_state.replace(params=b_state.params,
                                          batch_stats=b_state.batch_stats)
                data = TwoDomainMMEDataModule(data_path=root, batch_size=args.batch_size,
                                              seed=42, load_into_memory=True,
                                              device_cache=regime_cache("mme"))
                data.setup()

                # MMETrainer.default_step_fn handles the 4-tuple batches
                # (and the scanned dispatch under --device_cache)
                m_best, _, _ = fit(mme, m_state, data, max_epochs=args.epochs,
                                   out_dir="results/mme",
                                   resume=not args.force)
            results["mme"] = run_eval(mme.eval_step, m_best,
                                      target_test_batches())
            save_summary()
            log.info("mme: %s (%.0fs)", results["mme"], time.time() - t0)
        elif "mme" in args.regimes:
            log.info("mme: cached in study_summary.json")

        if args.distill:
            _distill_students(args, results, kw, regime_cache, save_summary,
                              target_test_batches)

        save_summary()
        print("STUDY SUMMARY (target-domain test):")
        for k, v in results.items():
            print(f"  {k:16s} acc {v['acc']:.2f}  iou {v['iou']:.2f}")
        return results
    finally:
        os.chdir(cwd)


def _distill_students(args, results, kw, regime_cache, save_summary,
                      target_test_batches) -> None:
    """Distill a LaneNetLite student from each adapted teacher and score
    it on the SAME target test split — per-regime evidence that the
    serving student carries the teacher's adapted accuracy (the bridge
    behind bench.py's student-fps headline)."""
    import jax

    from ..data.modules import (SimulatorDataModule, TwoDomainMMEDataModule)
    from ..train.checkpoint import load_weights
    from ..train.distill import DistillTrainer
    from ..train.loop import fit, run_eval
    from ..train.supervised import SupervisedTrainer

    # each student trains on the tree its teacher saw (HM/CycleGAN trees
    # were restyled in place during the regime, so they persist on disk).
    # Adapted regimes distill through the MME-style module so the KD term
    # also sees the target/unlabelled frames (train/distill.py docstring:
    # matching the teacher on source appearance alone gives the
    # adaptation back at test time); baseline stays source-only by
    # definition of that regime.
    trees = {"baseline": ("sourceData", SimulatorDataModule),
             "st": ("srd_st", TwoDomainMMEDataModule),
             "hm": ("srd_hm", TwoDomainMMEDataModule),
             "cyclegan": ("srd_cg", TwoDomainMMEDataModule),
             "mme": ("srd_mme", TwoDomainMMEDataModule)}
    for name in args.regimes:
        sk = f"student_{name}"
        if sk in results and not args.force:
            log.info("%s: cached in study_summary.json", sk)
            continue
        teacher_path = f"results/{name}/best_weights.msgpack"
        root, DM = trees[name]
        if not os.path.exists(teacher_path) or not os.path.exists(root):
            log.warning("%s: missing %s — skipping student", sk,
                        teacher_path if not os.path.exists(teacher_path)
                        else root)
            continue
        t0 = time.time()
        t_trainer = SupervisedTrainer(**kw())
        t_state = load_weights(teacher_path,
                               t_trainer.init_state(jax.random.key(0)))
        d_epochs = args.distill_epochs or args.epochs
        student = DistillTrainer(
            teacher_model=t_trainer.model, teacher_params=t_state.params,
            teacher_batch_stats=t_state.batch_stats, num_cls=4, lr=args.lr,
            augment=True, t_max=d_epochs)
        data = DM(data_path=root, batch_size=args.batch_size, seed=42,
                  load_into_memory=True, device_cache=regime_cache(sk))
        data.setup()
        s_best, _, _ = fit(student, student.init_state(jax.random.key(4)),
                           data, max_epochs=d_epochs,
                           out_dir=f"results/{sk}", resume=not args.force)
        results[sk] = run_eval(student.eval_step, s_best,
                               target_test_batches())
        save_summary()
        log.info("%s: %s (%.0fs)", sk, results[sk], time.time() - t0)


if __name__ == "__main__":
    main()

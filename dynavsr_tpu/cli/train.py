"""Training entry point — reference train.py (SURVEY.md §2.5, §3.1 [H]).

    python -m dynavsr_tpu.cli.train -opt configs/train/train_EDVR_M_REDS.yml

Drives all three trainer kinds via opt['model'] (video_base | downscaler |
video_meta): the reference's separate train / train_downscaler /
meta-train scripts share this skeleton; thin aliases exist for the
reference names. Multi-host: jax.distributed.initialize() when
opt['dist']; data sharded per process (loader), logs/ckpt on process 0.
"""

from __future__ import annotations

import argparse
import logging
import math
import os.path as osp
import time

import numpy as np

import jax
import jax.numpy as jnp


def synthesize_meta_batch(key, hr: np.ndarray, scale: int, estimator=None,
                          noise_range=(0.0, 0.0)):
    """Device-side (SLR, LR, centers) from HR windows (SURVEY.md §3.3).

    estimator: optional jitted MFDN apply — SLR = MFDN(LR) (the paper's
    estimator-in-the-loop variant) instead of the same-kernel synthesis.
    noise_range: optional read-noise augmentation (degradations.py;
    datasets.train.noise_range in YAML — beyond-reference extension)."""
    from dynavsr_tpu.data.degradations import synthesize_pair

    hr_j = jnp.asarray(hr)
    lr, slr, _ = synthesize_pair(key, hr_j, scale, noise_range=noise_range)
    if estimator is not None:
        slr = estimator(lr)
    c = hr.shape[1] // 2
    return {
        "SLR": slr,
        "LR": lr,
        "LR_center": lr[:, c],
        "HR_center": hr_j[:, c],
    }


def synthesize_downscaler_batch(key, hr: np.ndarray, scale: int,
                                noise_range=(0.0, 0.0)):
    from dynavsr_tpu.data.degradations import synthesize_pair

    lr, slr, _ = synthesize_pair(key, jnp.asarray(hr), scale,
                                 noise_range=noise_range)
    return {"LR": lr, "SLR": slr}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True, help="Path to YAML config.")
    parser.add_argument("--launcher", default="none", choices=["none", "jax"])
    parser.add_argument("--max-iters", type=int, default=None,
                        help="Override train.niter (smoke tests).")
    args = parser.parse_args(argv)

    from dynavsr_tpu.config import dict2str, parse
    from dynavsr_tpu.data.loader import create_dataloader, create_dataset
    from dynavsr_tpu.models.video_base_model import create_model
    from dynavsr_tpu.utils import (
        enable_compilation_cache,
        mkdir_and_rename,
        mkdirs,
        set_random_seed,
        setup_logger,
    )

    if args.launcher == "jax":
        jax.distributed.initialize()
    enable_compilation_cache()

    opt = parse(args.opt, is_train=True)
    rank0 = jax.process_index() == 0

    if rank0:
        # Reference train.py [H]: the experiment dir is archive-renamed only
        # for a FRESH run — a resuming run must keep the directory holding
        # the very training_state it is about to load.
        if not opt["path"].get("resume_state"):
            mkdir_and_rename(opt["path"]["experiments_root"])
        mkdirs([opt["path"]["models"], opt["path"]["training_state"],
                opt["path"]["val_images"]])
    setup_logger("base", opt["path"]["log"], "train", screen=rank0, tofile=rank0)
    logger = logging.getLogger("base")
    if rank0:
        logger.info(dict2str(opt))

    seed = opt["train"].get("manual_seed") or 0
    set_random_seed(seed)

    tb = None
    if rank0 and (opt.get("logger") or {}).get("tb_logger", True) is not False:
        from dynavsr_tpu.utils.observability import MetricsWriter

        tb = MetricsWriter(
            osp.join(opt["path"]["root"], "tb_logger", opt.get("name") or "run")
        )

    # ---- data
    train_loader = val_set = None
    for phase_key, dataset_opt in (opt["datasets"] or {}).items():
        phase = dataset_opt["phase"]
        if phase == "train":
            train_set = create_dataset(dataset_opt)
            train_loader = create_dataloader(train_set, dataset_opt, opt)
            logger.info("Train set: %d items, %d batches/epoch",
                        len(train_set), len(train_loader))
        elif phase == "val":
            val_set = create_dataset(dataset_opt)
    assert train_loader is not None, "no train dataset in config"

    # ---- model
    model = create_model(opt)
    niter = args.max_iters or int(opt["train"].get("niter") or 600000)
    start_epoch, current_step = 0, 0
    if opt["path"].get("resume_state"):
        start_epoch = model.resume_training(opt["path"]["resume_state"])
        current_step = int(model.state.step)
        # Deterministic skip-ahead: replay the epoch's index stream up to
        # the resumed step so no batch is repeated or skipped.
        train_loader.set_epoch(start_epoch)
        train_loader.set_skip_batches(current_step % max(1, len(train_loader)))
        logger.info("Resumed from iter %d (epoch %d)", current_step, start_epoch)

    which = opt.get("model", "video_base")
    scale = opt.get("scale", 4)
    key = jax.random.PRNGKey(seed)
    # Optional read-noise augmentation for the device-side degradation
    # synthesis (meta/downscaler training) — beyond-reference extension;
    # see degradations.synthesize_pair and the RESULTS.md robustness matrix.
    nr = (opt["datasets"].get("train") or {}).get("noise_range") or (0.0, 0.0)
    noise_range = (float(nr[0]), float(nr[1]))

    # Optional frozen degradation estimator in the meta loop (network_E;
    # reference meta-training loads a pre-trained MFDN — SURVEY.md §3.3).
    estimator_fn = None
    if which in ("video_meta", "meta", "dynavsr") and opt.get("network_E"):
        from dynavsr_tpu.models.networks import define_G

        est = define_G({"scale": scale, "network_G": opt["network_E"]})
        nf_e = (opt["datasets"].get("train") or {}).get("N_frames") or 5
        est_params = jax.jit(est.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, nf_e, 32, 32, 3)))
        est_path = (opt.get("path") or {}).get("pretrain_model_E")
        if est_path:
            est_params = model.load_pretrained(est_path, est_params)
        estimator_fn = jax.jit(lambda lr: est.apply(est_params, lr))

    print_freq = int(opt["logger"].get("print_freq") or 100) if opt.get("logger") else 100
    save_freq = int(opt["logger"].get("save_checkpoint_freq") or 5000) if opt.get("logger") else 5000
    val_freq = int(opt["train"].get("val_freq") or 5000)

    total_epochs = max(1, math.ceil(niter / max(1, len(train_loader))))
    t_last = time.time()
    done = False
    for epoch in range(start_epoch, total_epochs + 1):
        if done:
            break
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            if current_step >= niter:
                done = True
                break
            current_step += 1
            if which in ("video_meta", "meta", "dynavsr"):
                key, k = jax.random.split(key)
                model.feed_data(
                    synthesize_meta_batch(k, batch["HR"], scale, estimator_fn,
                                          noise_range=noise_range))
            elif which in ("downscaler", "estimator"):
                key, k = jax.random.split(key)
                src = batch.get("HR", batch.get("GT"))
                model.feed_data(synthesize_downscaler_batch(
                    k, src, scale, noise_range=noise_range))
            else:
                model.feed_data(batch)
            model.optimize_parameters(current_step)

            if rank0 and current_step % print_freq == 0:
                logs = model.get_current_log()
                dt = (time.time() - t_last) / print_freq
                t_last = time.time()
                msg = " ".join(f"{k}: {v:.4e}" for k, v in logs.items())
                logger.info("<epoch:%3d, iter:%8d, lr:%.3e, time:%.3fs> %s",
                            epoch, current_step, model.get_current_learning_rate(),
                            dt, msg)
                if tb is not None:
                    tb.add_scalars(current_step, {
                        **logs, "lr": model.get_current_learning_rate(),
                        "step_time_s": dt,
                    })

            if rank0 and val_set is not None and current_step % val_freq == 0:
                _validate(model, val_set, opt, current_step, logger)

            if rank0 and current_step % save_freq == 0:
                logger.info("Saving models and training states.")
                model.save(current_step)
                model.save_training_state(epoch, current_step)

    if rank0:
        logger.info("Saving the final model.")
        model.save(current_step)
        model.save_training_state(total_epochs, current_step)
        logger.info("End of training.")
    if tb is not None:
        tb.close()
    return current_step


def _validate(model, val_set, opt, step, logger):
    from dynavsr_tpu.eval.harness import evaluate_dataset

    n_frames = (opt["network_G"] or {}).get("nframes", 5)
    save_root = None
    if (opt.get("logger") or {}).get("save_val_images"):
        save_root = osp.join(opt["path"]["val_images"], f"iter_{step}")
    results = evaluate_dataset(
        model.make_infer_fn(),
        val_set,
        n_frames=n_frames,
        padding=(opt["datasets"].get("val") or {}).get("padding") or "reflection",
        save_root=save_root,
        logger=None,
    )
    if "_avg" in results:
        logger.info("# Validation iter %d # PSNR: %.4f SSIM: %.4f", step,
                    results["_avg"]["psnr_avg"], results["_avg"]["ssim_avg"])


if __name__ == "__main__":
    main()

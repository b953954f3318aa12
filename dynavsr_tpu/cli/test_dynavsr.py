"""DynaVSR adaptation eval — reference test_dynavsr-style script
(SURVEY.md §3.4 [behavior H, name L]).

Per clip: MFDN estimates the degradation (LR -> SLR), the VSR net runs k
adaptation steps on (SLR window -> LR center) then slides over the clip —
all ONE jitted adapt_and_infer per clip (lax.scan inner loop); clips are
independent, so multi-chip runs shard clips across devices.

    python -m dynavsr_tpu.cli.test_dynavsr -opt configs/test/test_DynaVSR_Vid4.yml
"""

from __future__ import annotations

import argparse
import logging
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--no-save-images", action="store_true")
    args = parser.parse_args(argv)

    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.config import dict2str, parse
    from dynavsr_tpu.data.loader import create_dataset
    from dynavsr_tpu.data.windows import all_windows
    from dynavsr_tpu.eval.harness import score_frames
    from dynavsr_tpu.models.networks import define_G
    from dynavsr_tpu.models.video_base_model import VideoBaseModel
    from dynavsr_tpu.utils import enable_compilation_cache, mkdirs, setup_logger

    enable_compilation_cache()
    opt = parse(args.opt, is_train=False)
    mkdirs(opt["path"]["results_root"])
    setup_logger("base", opt["path"]["log"], "test", screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))

    scale = opt.get("scale", 4)
    n_frames = (opt["network_G"] or {}).get("nframes", 5)

    # VSR net with meta-trained weights
    vsr = VideoBaseModel(opt)

    # Degradation estimator (MFDN/SFDN)
    est_opt = opt.get("network_E") or {"which_model_G": "MFDN", "nf": 64}
    estimator = define_G({"scale": scale, "network_G": est_opt})
    est_params = jax.jit(estimator.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, n_frames, 32, 32, 3))
    )
    est_path = (opt.get("path") or {}).get("pretrain_model_E")
    if est_path:
        est_params = vsr.load_pretrained(est_path, est_params)
    est_fwd = jax.jit(estimator.apply)

    a = opt.get("adapt") or {}
    ic = a.get("infer_chunk")
    # None-check, not `or`: explicit n_steps: 0 (adaptation disabled) /
    # lr: 0 / infer_chunk: 0 are all meaningful and must not fall through
    # to the defaults.
    cfg = AdaptConfig(
        n_steps=5 if a.get("n_steps") is None else int(a["n_steps"]),
        lr=1e-6 if a.get("lr") is None else float(a["lr"]),
        optimizer=a.get("optimizer") or "adam",
        # 'auto' -> reference train()-mode BN semantics for TOF/DUF
        # (measured better/tie — RESULTS.md round 3), plain for EDVR.
        bn_mode=a.get("bn_mode") or "auto",
        infer_chunk=8 if ic is None else int(ic),
    )
    # Mod-pad both the SLR pseudo-task inputs and the LR inference windows
    # (SLR = LR/4 is generally NOT pyramid-divisible, e.g. 9x11 on Vid4),
    # and apply TOF's bicubic pre-upscale front-end where the module does
    # not fold it in — one shared helper encodes the per-arch conventions.
    from dynavsr_tpu.models.padding import make_model_apply

    which = (opt["network_G"] or {}).get("which_model_G")
    padded_apply = make_model_apply(vsr.netG, which, scale)
    tl = (opt.get("eval") or {}).get("tile")
    if tl:
        # Large-frame serving: inference windows run as overlapping tiles
        # (eval/tiled.py). The adaptation pseudo-task's SLR windows are
        # smaller than any sensible tile, so they take the single-tile
        # passthrough — adaptation semantics unchanged. (The train_ema
        # mutable forward is deliberately NOT tiled: per-tile batch
        # statistics would differ from whole-frame stats.)
        from dynavsr_tpu.eval.tiled import make_tiled_apply

        th, tw = (tl, tl) if isinstance(tl, int) else tl
        padded_apply = make_tiled_apply(
            padded_apply, (int(th), int(tw)),
            int((opt.get("eval") or {}).get("tile_overlap") or 32), scale)
    mutable_apply = None
    from dynavsr_tpu.adapt.adaptation import resolve_bn_mode

    if resolve_bn_mode(cfg.bn_mode, vsr.netG) == "train_ema":
        from dynavsr_tpu.models.padding import make_mutable_model_apply

        mutable_apply = make_mutable_model_apply(vsr.netG, which, scale)
    run = make_adapt_and_infer(vsr.netG, cfg, apply_fn=padded_apply,
                               mutable_apply_fn=mutable_apply)
    # adapt.seq: sequence-mode inference (EDVR.forward_seq — per-frame
    # pyramids computed once per clip frame and shared across windows;
    # exact, tests/test_seq_infer.py). EDVR-only (needs the pyramid-split
    # forward) and not combinable with tiling; composes with
    # adapt.clip_parallel (the batched seq path below).
    use_seq = bool(a.get("seq")) and not tl
    if use_seq and which != "EDVR":
        logger.warning("adapt.seq requested but which_model_G=%s has no "
                       "pyramid-split forward — using the window-batched "
                       "path.", which)
        use_seq = False
    if use_seq and not a.get("clip_parallel"):
        from dynavsr_tpu.adapt.adaptation import make_adapt_and_infer_seq

        # apply_fn only drives the adaptation pseudo-task (SLR windows
        # need mod-padding); inference padding happens at the frame level
        # in the clip loop below.
        run_seq = make_adapt_and_infer_seq(
            vsr.netG, cfg, apply_fn=padded_apply,
            mutable_apply_fn=mutable_apply)

    results = {}
    for name, dataset_opt in (opt["datasets"] or {}).items():
        test_set = create_dataset(dataset_opt)
        ev = opt.get("eval") or {}
        n_adapt_cfg = int(a.get("n_windows") or 8)
        padding = dataset_opt.get("padding") or "reflection"

        def score(clip, sr, gt, losses):
            res = score_frames(
                sr, gt,
                ycbcr=bool(ev.get("ycbcr", True)),
                crop_border=int(ev.get("crop_border") or 0),
                save_dir=None if args.no_save_images else osp.join(
                    opt["path"]["results_root"], clip),
            )
            res["adapt_losses"] = np.asarray(losses).tolist()
            results[clip] = res
            if "psnr_avg" in res:
                logger.info("Clip %s: PSNR %.4f SSIM %.4f (adapted, %d steps)",
                            clip, res["psnr_avg"], res["ssim_avg"], cfg.n_steps)

        if a.get("clip_parallel"):
            # All clips adapt CONCURRENTLY, sharded over the device mesh
            # (SURVEY.md §2.6 adaptation-parallelism row).
            from dynavsr_tpu.adapt.adaptation import (
                batch_clips,
                make_adapt_and_infer_batched,
            )
            from dynavsr_tpu.parallel.mesh import data_mesh

            n_dev = int(opt.get("n_devices") or 0)
            mesh_devs = jax.devices()[: n_dev] if n_dev else jax.devices()
            mesh = data_mesh(mesh_devs)
            # Bucket clips by LR resolution: real test sets mix (h, w)
            # (Vid4 ships 144x176 AND 120x180 clips) and the batched path
            # stacks clips into one array. Each bucket runs the batched
            # adapt+infer independently (jit compiles per shape anyway, so
            # buckets share no executable regardless).
            raw_by_clip = {c: test_set.clip_frames(c) for c in test_set.names}
            buckets: dict = {}
            for c in test_set.names:
                buckets.setdefault(raw_by_clip[c].shape[1:3], []).append(c)
            if use_seq:
                from dynavsr_tpu.adapt.adaptation import (
                    batch_clips_seq,
                    make_adapt_and_infer_seq_batched,
                )

                run_b = make_adapt_and_infer_seq_batched(
                    vsr.netG, cfg, mesh=mesh, apply_fn=padded_apply,
                    mutable_apply_fn=mutable_apply)
            else:
                run_b = make_adapt_and_infer_batched(
                    vsr.netG, cfg, mesh=mesh, apply_fn=padded_apply,
                    mutable_apply_fn=mutable_apply)
            for _hw, clips in buckets.items():
                # Pad each bucket to a multiple of the mesh size so ALL
                # chips stay engaged (e.g. Vid4's 4 clips on an 8-chip
                # mesh); padded clips repeat the last one, never scored.
                pad_n = (-len(clips)) % len(mesh_devs)
                if use_seq:
                    # Batched SEQ serving: per-clip frames + window-index
                    # tables instead of materialized windows; pyramids
                    # extracted once per clip frame on each chip
                    # (make_adapt_and_infer_seq_batched).
                    raw = [raw_by_clip[c] for c in clips]
                    raw = raw + [raw[-1]] * pad_n
                    frames_b, win_b, adapt_w, lr_c, lens = batch_clips_seq(
                        raw, n_frames, padding, n_adapt_cfg, n_frames // 2)
                    h, w = frames_b.shape[2], frames_b.shape[3]
                    ph, pw = (-h) % 4, (-w) % 4
                    if ph or pw:
                        # Frame-level mod-4 pad == per-window mod-padding
                        # (the window path's apply_fn reflect-pads the same).
                        frames_b = np.pad(
                            frames_b,
                            [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                            mode="reflect")
                    slr_w = est_fwd(est_params, jnp.asarray(adapt_w).reshape(
                        (-1,) + adapt_w.shape[2:]))
                    slr_w = slr_w.reshape(adapt_w.shape[:2] + slr_w.shape[1:])
                    sr_all, losses_all = run_b(
                        vsr.state.params, slr_w, jnp.asarray(lr_c),
                        jnp.asarray(frames_b), jnp.asarray(win_b))
                    sr_all = np.asarray(sr_all)[:, :, : h * scale, : w * scale]
                else:
                    wins = [raw_by_clip[c][
                        all_windows(raw_by_clip[c].shape[0], n_frames,
                                    padding)]
                        for c in clips]
                    wins = wins + [wins[-1]] * pad_n
                    lr_w, adapt_w, lr_c, lens = batch_clips(
                        wins, n_adapt_cfg, n_frames // 2)
                    slr_w = est_fwd(est_params, jnp.asarray(adapt_w).reshape(
                        (-1,) + adapt_w.shape[2:]))
                    slr_w = slr_w.reshape(adapt_w.shape[:2] + slr_w.shape[1:])
                    sr_all, losses_all = run_b(
                        vsr.state.params, slr_w, jnp.asarray(lr_c),
                        jnp.asarray(lr_w))
                    sr_all = np.asarray(sr_all)
                for i, clip in enumerate(clips):
                    gt = test_set.clip_frames(clip, gt=True) \
                        if test_set.gt_index else None
                    score(clip, sr_all[i, : lens[i]], gt, losses_all[i])
        else:
            for clip in test_set.names:
                lq = test_set.clip_frames(clip)
                gt = test_set.clip_frames(clip, gt=True) if test_set.gt_index else None
                t = lq.shape[0]
                win = all_windows(t, n_frames, padding)
                # Bucket the frame count to a multiple of 8 so clips of
                # different lengths share ONE compiled adapt+infer program
                # (jit compiles per shape; Vid4's four lengths would
                # otherwise cost four multi-minute TPU compiles).
                t_pad = -(-t // 8) * 8
                n_adapt = min(n_adapt_cfg, t)
                adapt_windows = jnp.asarray(lq[win[:n_adapt]])
                slr_windows = est_fwd(est_params, adapt_windows)
                lr_centers = adapt_windows[:, n_frames // 2]
                if use_seq:
                    # Pad the clip (repeat last frame) to the bucketed T
                    # and mod-4 reflection-pad H/W once for the whole clip
                    # (the window path pads each window identically, so
                    # this is the same math — tests/test_cli_e2e.py pins
                    # seq == windowed through the real CLI).
                    h, w = lq.shape[1], lq.shape[2]
                    frames = np.concatenate(
                        [lq, np.repeat(lq[-1:], t_pad - t, axis=0)], axis=0) \
                        if t_pad != t else lq
                    win_pad = np.concatenate(
                        [win, np.repeat(win[-1:], t_pad - t, axis=0)], axis=0) \
                        if t_pad != t else win
                    ph, pw = (-h) % 4, (-w) % 4
                    if ph or pw:
                        frames = np.pad(
                            frames, [(0, 0), (0, ph), (0, pw), (0, 0)],
                            mode="reflect")
                    sr, losses = run_seq(
                        vsr.state.params, slr_windows, lr_centers,
                        jnp.asarray(frames), jnp.asarray(win_pad))
                    sr = np.asarray(sr)[:t, : h * scale, : w * scale]
                else:
                    windows = lq[win]
                    if t_pad != t:
                        windows = np.concatenate(
                            [windows, np.repeat(windows[-1:], t_pad - t, axis=0)],
                            axis=0)
                    sr, losses = run(vsr.state.params, slr_windows, lr_centers,
                                     jnp.asarray(windows))
                    sr = np.asarray(sr)[:t]
                score(clip, sr, gt, losses)
    if any("psnr_avg" in r for r in results.values()):
        avg_p = float(np.mean([r["psnr_avg"] for r in results.values()]))
        avg_s = float(np.mean([r["ssim_avg"] for r in results.values()]))
        logger.info("Average (adapted): PSNR %.4f SSIM %.4f", avg_p, avg_s)
        results["_avg"] = {"psnr_avg": avg_p, "ssim_avg": avg_s}
    return results


if __name__ == "__main__":
    main()

"""Blind-protocol adaptation-gain experiment (VERDICT.md round-1 item 3).

Demonstrates the DynaVSR product claim end-to-end through the REAL CLIs:
a VSR net trained on bicubic LR degrades under an unseen Gaussian kernel,
and MFDN-driven test-time adaptation recovers part of the loss
(DynaVSR Alg. 1 / SURVEY.md §0.5, §3.4).

Protocol (synthetic clips, no external data):
  1. synthesize HR clips; LR_bic = MATLAB-bicubic /4 (training degradation),
     LR_gauss = (HR * k_sigma) /4 with an isotropic Gaussian the VSR net
     never saw (the blind kernel).
  2. cli.train: supervised EDVR (small) on (LR_bic -> HR).
  3. cli.train: MFDN on device-synthesized random-kernel degradations.
  4. cli.test: EDVR on LR_gauss  -> baseline (mismatched) PSNR.
     cli.test_dynavsr: EDVR + MFDN + k adaptation steps on LR_gauss
                       -> adapted PSNR.
  5. PASS iff adapted > baseline.

    python tools/blind_adaptation_check.py [--sigma 2.0] [--iters 400]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_data(root: str, sigma: float, n_clips: int = 4, frames: int = 14,
              gh: int = 128, gw: int = 128, val_clips: int = 2):
    """HR clips of translating multi-scale texture (smooth fields + edges —
    natural-image-like spectra, not aliasing-adversarial); bicubic and
    Gaussian-blurred /4 LR legs."""
    import cv2

    import jax.numpy as jnp

    from dynavsr_tpu.data.degradations import blur_downsample, isotropic_kernel
    from dynavsr_tpu.data.resize import imresize

    rng = np.random.default_rng(0)
    kernel = isotropic_kernel(13, sigma)
    for c in range(n_clips + val_clips):
        split = "train" if c < n_clips else "val"
        for leg in ("GT", "LQ_bic", "LQ_gauss"):
            os.makedirs(f"{root}/{split}/{leg}/{c:03d}", exist_ok=True)
        # 1/f-ish texture: octaves of upsampled noise (coarse dominates)
        octaves = [
            (rng.random((gh // f, gw // f, 3)).astype(np.float32), a)
            for f, a in ((16, 0.5), (8, 0.25), (4, 0.15), (2, 0.10))
        ]
        for i in range(frames):
            gt = np.zeros((gh, gw, 3), np.float32)
            for o, (base, amp) in enumerate(octaves):
                shifted = np.roll(base, i * (o + 1), axis=1)
                gt += amp * cv2.resize(shifted, (gw, gh),
                                       interpolation=cv2.INTER_CUBIC)
            gt = np.clip(gt, 0, 1)
            lr_bic = np.asarray(imresize(jnp.asarray(gt), 0.25))
            lr_g = np.asarray(blur_downsample(jnp.asarray(gt)[None], kernel, 4)[0])
            for leg, img in (("GT", gt), ("LQ_bic", lr_bic), ("LQ_gauss", lr_g)):
                cv2.imwrite(f"{root}/{split}/{leg}/{c:03d}/{i:08d}.png",
                            (np.clip(img, 0, 1) * 255).round().astype(np.uint8))


def _write_yml(path: str, opt: dict):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(opt, f, sort_keys=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=1.8)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--mfdn-iters", type=int, default=600)
    ap.add_argument("--meta-iters", type=int, default=0,
                    help="optional MAML leg from the trained VSR init")
    ap.add_argument("--adapt-steps", type=int, default=20)
    ap.add_argument("--adapt-lrs", type=float, nargs="+",
                    default=[1e-6, 1e-5, 1e-4])
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--arch", default="edvr", choices=["edvr", "tof", "duf"],
                    help="VSR backbone (the paper adapts EDVR/TOF/DUF)")
    ap.add_argument("--root", default=None, help="reuse an existing run dir")
    args = ap.parse_args()

    from dynavsr_tpu.cli import test as cli_test
    from dynavsr_tpu.cli import test_dynavsr as cli_test_dynavsr
    from dynavsr_tpu.cli import train as cli_train
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    root = args.root or tempfile.mkdtemp(prefix="blind_adapt_")
    data = f"{root}/data"
    # A reused --root must match --sigma: the Gaussian legs are baked into
    # the data tree. Regenerate on mismatch (training legs use LQ_bic /
    # on-device random kernels, so existing checkpoints stay valid).
    marker = f"{data}/.sigma"
    if osp.exists(f"{data}/val/GT"):
        old = open(marker).read().strip() if osp.exists(marker) else None
        if old != repr(args.sigma):
            # Marker mismatch OR a pre-marker data tree of unknown sigma:
            # regenerate either way (the Gaussian legs are baked in).
            import shutil

            print(f"data tree sigma is {old or 'unknown'}; regenerating "
                  f"for --sigma {args.sigma}", flush=True)
            shutil.rmtree(data)
    if not osp.exists(f"{data}/val/GT"):
        make_data(data, args.sigma)
        with open(marker, "w") as f:
            f.write(repr(args.sigma))
    print(f"run dir: {root}", flush=True)

    if args.arch == "tof":
        # raw-LR contract via the module-internal bicubic front-end
        net_g = {"which_model_G": "TOF", "pre_upscale": True, "nframes": 5,
                 "dtype": "bfloat16"}
    elif args.arch == "duf":
        # DUF's valid temporal 3D convs need the full 7-frame window
        net_g = {"which_model_G": "DUF_16L", "nframes": 7, "dtype": "bfloat16"}
    else:
        net_g = {"which_model_G": "EDVR", "nf": args.nf, "nframes": 5,
                 "groups": 8, "front_RBs": 2, "back_RBs": 3,
                 "dtype": "bfloat16"}
    vsr_name = f"vsr_{args.arch}"
    n_frames = int(net_g.get("nframes", 5))

    # ---- 1) supervised VSR on bicubic LR
    vsr_ckpt = f"{root}/experiments/{vsr_name}/models/{args.iters}_G"
    if not osp.exists(vsr_ckpt):
        _write_yml(f"{root}/train_vsr.yml", {
            "name": vsr_name, "model": "video_base", "scale": 4,
            "path": {"root": root},
            "datasets": {"train": {
                "name": "synth", "mode": "REDS",
                "dataroot_GT": f"{data}/train/GT",
                "dataroot_LQ": f"{data}/train/LQ_bic",
                "N_frames": n_frames, "LQ_size": 16, "batch_size": 8, "n_workers": 2,
                "use_shuffle": True}},
            "network_G": net_g,
            "train": {"lr_G": 2.0e-4, "lr_scheme": "constant",
                      "niter": args.iters, "manual_seed": 0},
            "logger": {"print_freq": 100,
                       "save_checkpoint_freq": args.iters, "tb_logger": False},
        })
        cli_train.main(["-opt", f"{root}/train_vsr.yml"])
    assert osp.exists(vsr_ckpt), vsr_ckpt

    # ---- 2) MFDN on random-kernel degradations (covers the blind sigma)
    # MFDN concatenates frames along channels -> its params are N-frame
    # specific; train one per window length (7 for DUF, 5 otherwise).
    mfdn_ckpt = f"{root}/experiments/mfdn_n{n_frames}/models/{args.mfdn_iters}_G"
    if not osp.exists(mfdn_ckpt):
        _write_yml(f"{root}/train_mfdn.yml", {
            "name": f"mfdn_n{n_frames}", "model": "downscaler", "scale": 4,
            "path": {"root": root},
            "datasets": {"train": {
                "name": "synth_meta", "mode": "meta",
                "dataroot_GT": f"{data}/train/GT",
                "N_frames": n_frames, "GT_size": 64, "batch_size": 8, "n_workers": 2,
                "use_shuffle": True}},
            "network_G": {"which_model_G": "MFDN", "nf": 64},
            "train": {"lr_G": 1.0e-4, "lr_scheme": "constant",
                      "niter": args.mfdn_iters, "manual_seed": 0},
            "logger": {"print_freq": 100,
                       "save_checkpoint_freq": args.mfdn_iters,
                       "tb_logger": False},
        })
        cli_train.main(["-opt", f"{root}/train_mfdn.yml"])
    assert osp.exists(mfdn_ckpt), mfdn_ckpt

    def test_opt(name, lq_leg):
        return {
            "name": name, "model": "video_base", "scale": 4,
            "path": {"root": root, "pretrain_model_G": vsr_ckpt},
            "datasets": {"test": {
                "name": name, "mode": "video_test",
                "dataroot_GT": f"{data}/val/GT",
                "dataroot_LQ": f"{data}/val/{lq_leg}",
                "N_frames": n_frames, "padding": "reflection"}},
            "network_G": net_g,
            "eval": {"ycbcr": True, "crop_border": 4},
        }

    # ---- 2b) MFDN quality probe: does MFDN(LR_gauss) match the true
    # (LR_gauss * k_sigma) /4 SLR? If it doesn't, the pseudo-task teaches
    # the wrong degradation and adaptation cannot help.
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.data.degradations import blur_downsample, isotropic_kernel
    from dynavsr_tpu.data.io import glob_clip_folders, read_img_seq
    from dynavsr_tpu.models.networks import define_G
    from dynavsr_tpu.train.checkpoint import load_network

    clips_g = glob_clip_folders(f"{data}/val/LQ_gauss")
    lr_val = read_img_seq(next(iter(clips_g.values()))[:n_frames])[None]
    k_true = isotropic_kernel(13, args.sigma)
    slr_true = np.asarray(blur_downsample(jnp.asarray(lr_val), k_true, 4))
    mfdn = define_G({"scale": 4, "network_G": {"which_model_G": "MFDN", "nf": 64}})
    mfdn_params = jax.jit(mfdn.init)(jax.random.PRNGKey(0), jnp.asarray(lr_val))
    mfdn_params = load_network(mfdn_ckpt, like=mfdn_params)
    slr_mfdn = np.asarray(mfdn.apply(mfdn_params, jnp.asarray(lr_val)))
    from dynavsr_tpu.data.degradations import bicubic_downsample

    slr_bic = np.asarray(bicubic_downsample(jnp.asarray(lr_val), 4))
    mfdn_rmse = float(np.sqrt(np.mean((slr_mfdn - slr_true) ** 2)))
    bic_rmse = float(np.sqrt(np.mean((slr_bic - slr_true) ** 2)))
    print(f"MFDN probe: rmse(MFDN(LR), true SLR)={mfdn_rmse:.5f} vs "
          f"rmse(bicubic, true SLR)={bic_rmse:.5f} "
          f"(MFDN must be clearly lower)", flush=True)

    # ---- 2c) optional meta leg: MAML-train the VSR init with the
    # estimator in the loop (the paper's full recipe) before adapting.
    adapt_init_ckpt = vsr_ckpt
    if args.meta_iters > 0:
        meta_ckpt = f"{root}/experiments/meta_{args.arch}/models/{args.meta_iters}_G"
        if not osp.exists(meta_ckpt):
            _write_yml(f"{root}/train_meta.yml", {
                "name": f"meta_{args.arch}", "model": "video_meta", "scale": 4,
                "path": {"root": root, "pretrain_model_G": vsr_ckpt,
                         "pretrain_model_E": mfdn_ckpt},
                "datasets": {"train": {
                    "name": "synth_meta", "mode": "meta",
                    "dataroot_GT": f"{data}/train/GT",
                    "N_frames": n_frames, "GT_size": 64, "batch_size": 4,
                    "n_workers": 2, "use_shuffle": True}},
                "network_G": net_g,
                "network_E": {"which_model_G": "MFDN", "nf": 64},
                "train": {"lr_G": 1.0e-5, "lr_scheme": "constant",
                          "niter": args.meta_iters,
                          "maml_lr_alpha": 1.0e-5, "maml_adapt_iter": 1,
                          "manual_seed": 0},
                "logger": {"print_freq": 50,
                           "save_checkpoint_freq": args.meta_iters,
                           "tb_logger": False},
            })
            cli_train.main(["-opt", f"{root}/train_meta.yml"])
        adapt_init_ckpt = meta_ckpt

    # ---- 3) matched (bicubic) reference + mismatched baseline
    _write_yml(f"{root}/test_bic.yml", test_opt("bic", "LQ_bic"))
    r_bic = cli_test.main(["-opt", f"{root}/test_bic.yml", "--no-save-images"])
    psnr_bic = r_bic["test"]["_avg"]["psnr_avg"]

    _write_yml(f"{root}/test_gauss.yml", test_opt("gauss", "LQ_gauss"))
    r_gauss = cli_test.main(["-opt", f"{root}/test_gauss.yml", "--no-save-images"])
    psnr_gauss = r_gauss["test"]["_avg"]["psnr_avg"]

    # ---- 4) adapted on the blind kernel, sweeping the adaptation lr
    best = None
    sweep = {}
    for lr in args.adapt_lrs:
        adapt_opt = test_opt(f"gauss_adapted_{lr:g}", "LQ_gauss")
        adapt_opt["path"]["pretrain_model_G"] = adapt_init_ckpt
        adapt_opt["path"]["pretrain_model_E"] = mfdn_ckpt
        adapt_opt["network_E"] = {"which_model_G": "MFDN", "nf": 64}
        adapt_opt["adapt"] = {"n_steps": args.adapt_steps, "lr": lr,
                              "optimizer": "adam", "n_windows": 8}
        yml = f"{root}/test_gauss_adapted_{lr:g}.yml"
        _write_yml(yml, adapt_opt)
        r_adapt = cli_test_dynavsr.main(["-opt", yml, "--no-save-images"])
        p = r_adapt["_avg"]["psnr_avg"]
        sweep[f"{lr:g}"] = round(p, 4)
        if best is None or p > best[1]:
            best = (lr, p)

    gain = best[1] - psnr_gauss
    print(json.dumps({
        "arch": args.arch,
        "sigma": args.sigma,
        "meta_iters": args.meta_iters,
        "mfdn_rmse_vs_true_slr": round(mfdn_rmse, 5),
        "bicubic_rmse_vs_true_slr": round(bic_rmse, 5),
        "psnr_bicubic_matched": round(psnr_bic, 4),
        "psnr_gauss_no_adapt": round(psnr_gauss, 4),
        "psnr_gauss_adapted_sweep": sweep,
        "best_adapt_lr": best[0],
        "adaptation_gain_db": round(gain, 4),
        "kernel_mismatch_drop_db": round(psnr_bic - psnr_gauss, 4),
        "adapt_steps": args.adapt_steps,
    }))
    ok = gain > 0.05
    print(f"adaptation gain positive: {ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

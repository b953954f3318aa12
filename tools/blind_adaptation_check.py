"""Blind-protocol adaptation-gain experiment (VERDICT round-1 item 3;
matrix form round-2 item 4).

Demonstrates the DynaVSR product claim end-to-end through the REAL CLIs:
a VSR net trained on bicubic LR degrades under unseen Gaussian kernels,
and MFDN-driven test-time adaptation recovers part of the loss
(DynaVSR Alg. 1 / SURVEY.md §0.5, §3.4; the WACV'21 paper reports the
claim over kernel *distributions*, hence the kernel matrix here).

Protocol (synthetic clips, no external data):
  1. synthesize HR clips; LR_bic = MATLAB-bicubic /4 (training degradation),
     plus one blurred /4 leg PER blind kernel in --kernels (isotropic or
     anisotropic Gaussians the VSR net never saw).
  2. cli.train: supervised EDVR/TOF/DUF (small) on (LR_bic -> HR).
  3. cli.train: MFDN on device-synthesized random-kernel degradations.
  3b. optional: MAML meta leg from the trained init (--meta-iters).
  4. per kernel — cli.test: baseline (mismatched) PSNR/SSIM;
     cli.test_dynavsr: + k adaptation steps -> adapted PSNR/SSIM.
  5. PASS iff the mean adaptation gain across kernels > 0.05 dB.

    python tools/blind_adaptation_check.py [--sigma 1.8] [--iters 600]
    python tools/blind_adaptation_check.py \
        --kernels iso:1.2 iso:1.8 iso:2.6 aniso:2.4:1.2:0.79 \
        --seed 1 --meta-iters 150 --adapt-lrs 1e-6

--groups (EDVR only) trains/adapts a deformable_groups=N variant — the
Gd=1-vs-Gd=8 flagship quality-parity experiment (round-2 VERDICT item 1).
--bn-mode train_ema switches the adaptation to the reference's
train()-mode BN semantics (TOF/DUF; round-2 VERDICT item 6).
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


def parse_kernel(spec: str):
    """'iso:S' or 'aniso:SX:SY:THETA', with an optional trailing 'nSIG'
    additive-Gaussian-noise part (e.g. 'iso:1.8:n0.03' — noise sigma in
    [0,1] image units, applied to the LR AFTER blur-downsample).
    Returns (tag, kernel ndarray (13, 13), noise_sigma)."""
    from dynavsr_tpu.data.degradations import anisotropic_kernel, isotropic_kernel

    parts = spec.split(":")
    noise = 0.0
    if len(parts) > 1 and parts[-1].startswith("n"):
        noise = float(parts[-1][1:])
        parts = parts[:-1]
    suffix = f"n{noise:g}" if noise else ""
    if parts[0] == "iso":
        (s,) = map(float, parts[1:])
        return f"iso{s:g}{suffix}", np.asarray(isotropic_kernel(13, s)), noise
    if parts[0] == "aniso":
        sx, sy, th = map(float, parts[1:])
        return f"aniso{sx:g}x{sy:g}t{th:g}{suffix}", np.asarray(
            anisotropic_kernel(13, sx, sy, th)), noise
    raise ValueError(
        f"bad kernel spec {spec!r} (iso:S | aniso:SX:SY:THETA, optional :nSIG)")


def make_gt(root: str, seed: int, n_clips: int = 4, frames: int = 14,
            gh: int = 128, gw: int = 128, val_clips: int = 2):
    """HR clips of translating multi-scale texture (smooth fields + edges —
    natural-image-like spectra, not aliasing-adversarial) + bicubic /4 leg."""
    import cv2

    import jax.numpy as jnp

    from dynavsr_tpu.data.resize import imresize

    rng = np.random.default_rng(seed)
    for c in range(n_clips + val_clips):
        split = "train" if c < n_clips else "val"
        for leg in ("GT", "LQ_bic"):
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
            for leg, img in (("GT", gt), ("LQ_bic", lr_bic)):
                cv2.imwrite(f"{root}/{split}/{leg}/{c:03d}/{i:08d}.png",
                            (np.clip(img, 0, 1) * 255).round().astype(np.uint8))


def make_blur_leg(root: str, tag: str, kernel: np.ndarray,
                  noise_sigma: float = 0.0):
    """(GT * k) /4 val leg for one blind kernel, from the saved GT.

    Only the val split is synthesized: supervised training reads LQ_bic,
    MFDN/meta train from GT with on-device kernels, and every test config
    points at val/LQ_{tag} — a train-split blur leg would be dead disk."""
    import cv2
    import zlib

    import jax.numpy as jnp

    from dynavsr_tpu.data.degradations import blur_downsample
    from dynavsr_tpu.data.io import glob_clip_folders

    kernel_j = jnp.asarray(kernel)
    for split in ("val",):
        clips = glob_clip_folders(f"{root}/{split}/GT")
        for clip, frames in clips.items():
            out_dir = f"{root}/{split}/LQ_{tag}/{clip}"
            os.makedirs(out_dir, exist_ok=True)
            for f in frames:
                # NB: no BGR<->RGB flip — make_gt writes its RGB arrays
                # straight through imwrite, so imread returns them in the
                # original order; the blur must stay channel-consistent
                # with the GT/LQ_bic legs.
                gt = cv2.imread(f).astype(np.float32) / 255.0
                lr = np.asarray(
                    blur_downsample(jnp.asarray(gt)[None], kernel_j, 4)[0])
                if noise_sigma > 0:
                    # deterministic per-frame noise (reproducible legs);
                    # crc32, NOT hash() — str hashes are PYTHONHASHSEED-
                    # randomized per process (same footgun as datasets.py).
                    nrng = np.random.default_rng(zlib.crc32(
                        f"{tag}/{clip}/{osp.basename(f)}".encode()))
                    lr = lr + nrng.normal(
                        0.0, noise_sigma, lr.shape).astype(np.float32)
                cv2.imwrite(osp.join(out_dir, osp.basename(f)),
                            (np.clip(lr, 0, 1) * 255).round().astype(np.uint8))


def _write_yml(path: str, opt: dict):
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(opt, f, sort_keys=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=1.8,
                    help="shorthand for --kernels iso:<sigma>")
    ap.add_argument("--kernels", nargs="+", default=None,
                    help="blind kernel specs: iso:S | aniso:SX:SY:THETA")
    ap.add_argument("--seed", type=int, default=0,
                    help="data-texture + training manual_seed")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--mfdn-iters", type=int, default=600)
    ap.add_argument("--meta-iters", type=int, default=0,
                    help="optional MAML leg from the trained VSR init")
    ap.add_argument("--adapt-steps", type=int, default=20)
    ap.add_argument("--adapt-lrs", type=float, nargs="+",
                    default=[1e-6, 1e-5, 1e-4])
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--front-rbs", type=int, default=2,
                    help="EDVR front residual blocks (EDVR-M ships 5 — "
                         "pass --nf 64 --front-rbs 5 --back-rbs 10 to run "
                         "the protocol at the production shape; round-4 "
                         "verdict weak item 1)")
    ap.add_argument("--back-rbs", type=int, default=3,
                    help="EDVR back residual blocks (EDVR-M ships 10)")
    ap.add_argument("--groups", type=int, default=8,
                    help="EDVR deformable groups (1 = TPU-flagship variant)")
    ap.add_argument("--bn-mode", default="auto",
                    choices=["auto", "grad_stats", "train_ema"],
                    help="BN adaptation semantics (TOF/DUF); auto = "
                         "train_ema for BN nets (measured better/tie)")
    ap.add_argument("--arch", default="edvr", choices=["edvr", "tof", "duf"],
                    help="VSR backbone (the paper adapts EDVR/TOF/DUF)")
    ap.add_argument("--estimator", default="mfdn", choices=["mfdn", "sfdn"],
                    help="degradation estimator: MFDN (multi-frame, "
                         "window-length-specific) or SFDN (single-frame "
                         "variant, window-length-agnostic) — SURVEY §2.1")
    ap.add_argument("--train-noise", type=float, default=0.0,
                    help="noise-aware degradation synthesis: MFDN + meta "
                         "legs train with noise_range [0, SIG] "
                         "(datasets.train.noise_range; beyond-reference "
                         "extension — A/B against the blur-only default)")
    ap.add_argument("--root", default=None, help="reuse an existing run dir")
    args = ap.parse_args()

    from dynavsr_tpu.cli import test as cli_test
    from dynavsr_tpu.cli import test_dynavsr as cli_test_dynavsr
    from dynavsr_tpu.cli import train as cli_train
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    kernels = [parse_kernel(s)
               for s in (args.kernels or [f"iso:{args.sigma:g}"])]
    root = args.root or tempfile.mkdtemp(prefix="blind_adapt_")
    data = f"{root}/data"
    # A reused --root must match --seed: textures are baked into the data
    # tree (checkpoints under a different root are never mixed in).
    marker = f"{data}/.seed"
    if osp.exists(f"{data}/val/GT"):
        old = open(marker).read().strip() if osp.exists(marker) else None
        if old != repr(args.seed):
            import shutil

            print(f"data tree seed is {old or 'unknown'}; regenerating "
                  f"for --seed {args.seed}", flush=True)
            shutil.rmtree(data)
    if not osp.exists(f"{data}/val/GT"):
        make_gt(data, args.seed)
        with open(marker, "w") as f:
            f.write(repr(args.seed))
    for tag, k, noise in kernels:
        if not osp.exists(f"{data}/val/LQ_{tag}"):
            print(f"synthesizing blind-kernel leg LQ_{tag}", flush=True)
            make_blur_leg(data, tag, k, noise)
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
                 "groups": args.groups, "front_RBs": args.front_rbs,
                 "back_RBs": args.back_rbs, "dtype": "bfloat16"}
    # Non-default shape knobs are baked into the checkpoint name so a
    # reused --root never serves an nf=32 init to an nf=64 eval (the
    # historical default shape keeps the suffix-free name).
    vsr_name = f"vsr_{args.arch}" + (
        f"_gd{args.groups}" if args.arch == "edvr" and args.groups != 8 else "")
    if args.arch == "edvr":
        if args.nf != 32:
            vsr_name += f"_nf{args.nf}"
        if (args.front_rbs, args.back_rbs) != (2, 3):
            vsr_name += f"_rb{args.front_rbs}x{args.back_rbs}"
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
                      "niter": args.iters, "manual_seed": args.seed},
            "logger": {"print_freq": 100,
                       "save_checkpoint_freq": args.iters, "tb_logger": False},
        })
        cli_train.main(["-opt", f"{root}/train_vsr.yml"])
    assert osp.exists(vsr_ckpt), vsr_ckpt

    # ---- 2) MFDN on random-kernel degradations (covers the blind kernels)
    # MFDN concatenates frames along channels -> its params are N-frame
    # specific; train one per window length (7 for DUF, 5 otherwise).
    est_which = args.estimator.upper()  # MFDN | SFDN
    nz = f"_nz{args.train_noise:g}" if args.train_noise > 0 else ""
    # SFDN is per-frame -> window-length-agnostic; MFDN concatenates frames
    # along channels -> one per window length.
    mfdn_name = (f"mfdn_n{n_frames}{nz}" if est_which == "MFDN"
                 else f"sfdn{nz}")
    mfdn_ckpt = f"{root}/experiments/{mfdn_name}/models/{args.mfdn_iters}_G"
    if not osp.exists(mfdn_ckpt):
        train_ds = {
            "name": "synth_meta", "mode": "meta",
            "dataroot_GT": f"{data}/train/GT",
            "N_frames": n_frames, "GT_size": 64, "batch_size": 8, "n_workers": 2,
            "use_shuffle": True}
        if args.train_noise > 0:
            train_ds["noise_range"] = [0.0, args.train_noise]
        _write_yml(f"{root}/train_mfdn.yml", {
            "name": mfdn_name, "model": "downscaler", "scale": 4,
            "path": {"root": root},
            "datasets": {"train": train_ds},
            "network_G": {"which_model_G": est_which, "nf": 64},
            "train": {"lr_G": 1.0e-4, "lr_scheme": "constant",
                      "niter": args.mfdn_iters, "manual_seed": args.seed},
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

    # ---- 2c) optional meta leg: MAML-train the VSR init with the
    # estimator in the loop (the paper's full recipe) before adapting.
    adapt_init_ckpt = vsr_ckpt
    if args.meta_iters > 0:
        # The estimator is IN the meta training loop — encode it in the
        # cache name (mfdn_name already does) so a reused --root never
        # serves an MFDN-meta init to an --estimator sfdn eval. The
        # default (mfdn) keeps the historical suffix-free name so
        # existing roots stay valid.
        est_sfx = "" if args.estimator == "mfdn" else f"_{args.estimator}"
        meta_name = f"meta_{vsr_name[4:]}{est_sfx}{nz}"
        meta_ckpt = f"{root}/experiments/{meta_name}/models/{args.meta_iters}_G"
        if not osp.exists(meta_ckpt):
            meta_ds = {
                "name": "synth_meta", "mode": "meta",
                "dataroot_GT": f"{data}/train/GT",
                "N_frames": n_frames, "GT_size": 64, "batch_size": 4,
                "n_workers": 2, "use_shuffle": True}
            if args.train_noise > 0:
                meta_ds["noise_range"] = [0.0, args.train_noise]
            _write_yml(f"{root}/train_meta.yml", {
                "name": meta_name, "model": "video_meta", "scale": 4,
                "path": {"root": root, "pretrain_model_G": vsr_ckpt,
                         "pretrain_model_E": mfdn_ckpt},
                "datasets": {"train": meta_ds},
                "network_G": net_g,
                "network_E": {"which_model_G": est_which, "nf": 64},
                "train": {"lr_G": 1.0e-5, "lr_scheme": "constant",
                          "niter": args.meta_iters,
                          "maml_lr_alpha": 1.0e-5, "maml_adapt_iter": 1,
                          "manual_seed": args.seed},
                "logger": {"print_freq": 50,
                           "save_checkpoint_freq": args.meta_iters,
                           "tb_logger": False},
            })
            cli_train.main(["-opt", f"{root}/train_meta.yml"])
        adapt_init_ckpt = meta_ckpt

    # ---- 3) matched (bicubic) reference — kernel-independent
    _write_yml(f"{root}/test_bic.yml", test_opt("bic", "LQ_bic"))
    r_bic = cli_test.main(["-opt", f"{root}/test_bic.yml", "--no-save-images"])
    psnr_bic = r_bic["test"]["_avg"]["psnr_avg"]

    # ---- 4) per blind kernel: mismatched baseline + adapted sweep
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.data.degradations import bicubic_downsample, blur_downsample
    from dynavsr_tpu.data.io import glob_clip_folders, read_img_seq
    from dynavsr_tpu.models.networks import define_G
    from dynavsr_tpu.train.checkpoint import load_network

    mfdn = define_G({"scale": 4, "network_G": {"which_model_G": est_which, "nf": 64}})
    mfdn_params = None  # lazy init against the first val clip

    per_kernel = {}
    for tag, k_true, _noise in kernels:
        yml = f"{root}/test_{tag}.yml"
        _write_yml(yml, test_opt(tag, f"LQ_{tag}"))
        r_gauss = cli_test.main(["-opt", yml, "--no-save-images"])
        psnr_gauss = r_gauss["test"]["_avg"]["psnr_avg"]
        ssim_gauss = r_gauss["test"]["_avg"]["ssim_avg"]

        # MFDN quality probe: does MFDN(LR_blur) match the true
        # (LR_blur * k) /4 SLR? If not, the pseudo-task teaches the wrong
        # degradation and adaptation cannot help.
        clips_g = glob_clip_folders(f"{data}/val/LQ_{tag}")
        lr_val = read_img_seq(next(iter(clips_g.values()))[:n_frames])[None]
        slr_true = np.asarray(
            blur_downsample(jnp.asarray(lr_val), jnp.asarray(k_true), 4))
        if mfdn_params is None:
            mfdn_params = jax.jit(mfdn.init)(
                jax.random.PRNGKey(0), jnp.asarray(lr_val))
            mfdn_params = load_network(mfdn_ckpt, like=mfdn_params)
        slr_mfdn = np.asarray(mfdn.apply(mfdn_params, jnp.asarray(lr_val)))
        slr_bic = np.asarray(bicubic_downsample(jnp.asarray(lr_val), 4))
        mfdn_rmse = float(np.sqrt(np.mean((slr_mfdn - slr_true) ** 2)))
        bic_rmse = float(np.sqrt(np.mean((slr_bic - slr_true) ** 2)))
        print(f"[{tag}] MFDN probe: rmse(MFDN(LR), true SLR)={mfdn_rmse:.5f} "
              f"vs rmse(bicubic, true SLR)={bic_rmse:.5f}", flush=True)

        best = None
        sweep = {}
        for lr in args.adapt_lrs:
            adapt_opt = test_opt(f"{tag}_adapted_{lr:g}", f"LQ_{tag}")
            adapt_opt["path"]["pretrain_model_G"] = adapt_init_ckpt
            adapt_opt["path"]["pretrain_model_E"] = mfdn_ckpt
            adapt_opt["network_E"] = {"which_model_G": est_which, "nf": 64}
            adapt_opt["adapt"] = {"n_steps": args.adapt_steps, "lr": lr,
                                  "optimizer": "adam", "n_windows": 8,
                                  "bn_mode": args.bn_mode}
            ayml = f"{root}/test_{tag}_adapted_{lr:g}.yml"
            _write_yml(ayml, adapt_opt)
            r_adapt = cli_test_dynavsr.main(["-opt", ayml, "--no-save-images"])
            p, s = r_adapt["_avg"]["psnr_avg"], r_adapt["_avg"]["ssim_avg"]
            sweep[f"{lr:g}"] = {"psnr": round(p, 4), "ssim": round(s, 4)}
            if best is None or p > best[1]:
                best = (lr, p, s)

        per_kernel[tag] = {
            "mfdn_rmse_vs_true_slr": round(mfdn_rmse, 5),
            "bicubic_rmse_vs_true_slr": round(bic_rmse, 5),
            "psnr_no_adapt": round(psnr_gauss, 4),
            "ssim_no_adapt": round(ssim_gauss, 4),
            "adapted_sweep": sweep,
            "best_adapt_lr": best[0],
            "psnr_adapted": round(best[1], 4),
            "ssim_adapted": round(best[2], 4),
            "adaptation_gain_db": round(best[1] - psnr_gauss, 4),
            "kernel_mismatch_drop_db": round(psnr_bic - psnr_gauss, 4),
        }
        print(f"[{tag}] gain {per_kernel[tag]['adaptation_gain_db']:+.2f} dB "
              f"(blind {psnr_gauss:.2f} -> adapted {best[1]:.2f})", flush=True)

    gains = [v["adaptation_gain_db"] for v in per_kernel.values()]
    print(json.dumps({
        "arch": args.arch,
        "groups": args.groups if args.arch == "edvr" else None,
        "seed": args.seed,
        "bn_mode": args.bn_mode,
        "train_noise": args.train_noise,
        "estimator": args.estimator,
        "meta_iters": args.meta_iters,
        "adapt_steps": args.adapt_steps,
        "psnr_bicubic_matched": round(psnr_bic, 4),
        "ssim_bicubic_matched": round(r_bic["test"]["_avg"]["ssim_avg"], 4),
        "per_kernel": per_kernel,
        "mean_gain_db": round(float(np.mean(gains)), 4),
        "min_gain_db": round(float(np.min(gains)), 4),
        "max_gain_db": round(float(np.max(gains)), 4),
    }))
    ok = float(np.mean(gains)) > 0.05
    print(f"mean adaptation gain positive: {ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

"""Evaluation entry point — reference test.py / test_Vid4_REDS4_with_GT.py
(SURVEY.md §2.5 [H]).

    python -m dynavsr_tpu.cli.test -opt configs/test/test_EDVR_M_REDS4.yml
"""

from __future__ import annotations

import argparse
import logging
import os.path as osp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--no-save-images", action="store_true")
    args = parser.parse_args(argv)

    from dynavsr_tpu.config import dict2str, parse
    from dynavsr_tpu.data.loader import create_dataset
    from dynavsr_tpu.eval.harness import evaluate_dataset
    from dynavsr_tpu.models.video_base_model import create_model
    from dynavsr_tpu.utils import mkdirs, setup_logger

    opt = parse(args.opt, is_train=False)
    mkdirs(opt["path"]["results_root"])
    setup_logger("base", opt["path"]["log"], "test", screen=True, tofile=True)
    logger = logging.getLogger("base")
    logger.info(dict2str(opt))

    model = create_model(opt)
    all_results = {}
    for name, dataset_opt in (opt["datasets"] or {}).items():
        test_set = create_dataset(dataset_opt)
        logger.info("Testing [%s] (%d clips)...", dataset_opt.get("name") or name,
                    len(test_set.names))
        ev = opt.get("eval") or {}
        # eval.seq: sequence-mode inference (per-frame pyramids shared
        # across sliding windows — exact, EDVR only; see
        # VideoBaseModel.make_seq_infer_fn). Falls back to the window
        # path when the arch/config doesn't support it.
        seq_fn = model.make_seq_infer_fn() if ev.get("seq") else None
        if ev.get("seq") and seq_fn is None:
            logger.warning("eval.seq requested but unsupported for this "
                           "config (non-EDVR arch or eval.tile set) — "
                           "using the window-batched path.")
        results = evaluate_dataset(
            model.make_infer_fn(),
            test_set,
            n_frames=dataset_opt.get("N_frames") or 5,
            padding=dataset_opt.get("padding") or "reflection",
            ycbcr=bool(ev.get("ycbcr", False)),
            crop_border=int(ev.get("crop_border") or 0),
            save_root=None if args.no_save_images else osp.join(
                opt["path"]["results_root"], dataset_opt.get("name") or name),
            logger=logger,
            seq_fn=seq_fn,
        )
        all_results[name] = results
    return all_results


if __name__ == "__main__":
    main()

"""Experiment utilities — reference utils/util.py parity (SURVEY.md §2.5 [H]).

setup_logger / mkdirs / mkdir_and_rename (archives stale experiment dirs
with a timestamp suffix) / set_random_seed / ProgressBar keep the
reference's behavior; tensor2img & PSNR/SSIM live in eval/ (bit-parity
critical, tested separately).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
import random
import shutil
import sys
import time
from datetime import datetime

import numpy as np

__all__ = [
    "setup_logger",
    "mkdirs",
    "mkdir_and_rename",
    "set_random_seed",
    "get_timestamp",
    "ProgressBar",
    "enable_compilation_cache",
]


def get_timestamp() -> str:
    return datetime.now().strftime("%y%m%d-%H%M%S")


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Persistent XLA compilation cache: TPU compiles here route through a
    remote AOT server at ~30-60 s per executable (CLAUDE.md gotchas), so
    reusing executables across process restarts saves minutes per run.
    Call BEFORE the first jit compilation. Safe to call repeatedly."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DYNAVSR_COMPILATION_CACHE", osp.expanduser("~/.cache/dynavsr_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never fatal
        logging.getLogger("base").warning("compilation cache disabled: %s", e)


def mkdirs(paths) -> None:
    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        os.makedirs(p, exist_ok=True)


def mkdir_and_rename(path: str) -> None:
    """If path exists, archive it as <path>_archived_<ts>, then mkdir anew."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        logging.getLogger("base").info("Path already exists. Rename it to %s", new_name)
        shutil.move(path, new_name)
    os.makedirs(path, exist_ok=True)


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(
    logger_name: str,
    root: str,
    phase: str,
    level: int = logging.INFO,
    screen: bool = False,
    tofile: bool = True,
) -> logging.Logger:
    """Per-name file+console logger (reference utils/util.py:setup_logger).

    Idempotent, unlike the reference's append-only version: re-setup of the
    same logger name REPLACES its handlers. The reference CLIs are one-shot
    processes so stacking never showed there; our tools (e.g.
    tools/blind_adaptation_check.py) drive the CLIs in-process once per
    protocol leg, which would otherwise duplicate every line per leg and
    leak open log-file handles."""
    lg = logging.getLogger(logger_name)
    for h in list(lg.handlers):
        lg.removeHandler(h)
        h.close()
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    lg.setLevel(level)
    lg.propagate = False
    if tofile:
        mkdirs(root)
        log_file = osp.join(root, f"{phase}_{get_timestamp()}.log")
        fh = logging.FileHandler(log_file, mode="w")
        fh.setFormatter(formatter)
        lg.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        lg.addHandler(sh)
    return lg


class ProgressBar:
    """Terminal progress bar (reference utils/util.py:ProgressBar)."""

    def __init__(self, task_num: int = 0, bar_width: int = 50, start: bool = True):
        self.task_num = task_num
        self.bar_width = bar_width
        self.completed = 0
        if start:
            self.start()

    def start(self) -> None:
        if self.task_num > 0:
            sys.stdout.write(
                f"[{' ' * self.bar_width}] 0/{self.task_num}, elapsed: 0s, ETA:\n"
            )
        else:
            sys.stdout.write("completed: 0, elapsed: 0s")
        sys.stdout.flush()
        self.start_time = time.time()

    def update(self, msg: str = "In progress...") -> None:
        self.completed += 1
        elapsed = time.time() - self.start_time
        fps = self.completed / max(elapsed, 1e-9)
        if self.task_num > 0:
            percentage = self.completed / float(self.task_num)
            eta = int(elapsed * (1 - percentage) / max(percentage, 1e-9) + 0.5)
            mark_width = int(self.bar_width * percentage)
            bar_chars = ">" * mark_width + " " * (self.bar_width - mark_width)
            sys.stdout.write(
                f"\033[2F\033[J[{bar_chars}] {self.completed}/{self.task_num}, "
                f"{fps:.1f} task/s, elapsed: {int(elapsed + 0.5)}s, "
                f"ETA: {eta:5}s\n{msg}\n"
            )
        else:
            sys.stdout.write(
                f"completed: {self.completed}, elapsed: {int(elapsed + 0.5)}s, "
                f"{fps:.1f} tasks/s"
            )
        sys.stdout.flush()

"""YAML config system — reference options/options.py parity (SURVEY.md §2.5 [H]).

Field names and semantics are kept 1:1 so reference YAML files port without
edits: `parse(path, is_train)` propagates `scale`/`is_train` into every
dataset block, splits dataset keys on '_' (train_1 -> phase 'train'),
expands `dataroot_*` paths, flags `.lmdb` roots as data_type='lmdb',
derives `experiments_root/{models,training_state,log,val_images}` (train)
or `results_root` (test), and wraps everything in NoneDict so missing keys
read as None instead of raising — exactly the reference's null-defaulting
contract.
"""

from __future__ import annotations

import os
import os.path as osp
from collections import OrderedDict
from typing import Any, Mapping, Optional

import yaml

__all__ = ["parse", "dict_to_nonedict", "dict2str", "check_resume", "NoneDict"]


class NoneDict(dict):
    """dict returning None for missing keys (reference options.py:NoneDict)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt: Any) -> Any:
    if isinstance(opt, dict):
        return NoneDict({k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, (list, tuple)):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def _ordered_load(stream) -> OrderedDict:
    class OrderedLoader(yaml.SafeLoader):
        pass

    def construct_mapping(loader, node):
        loader.flatten_mapping(node)
        return OrderedDict(loader.construct_pairs(node))

    OrderedLoader.add_constructor(
        yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, construct_mapping
    )
    return yaml.load(stream, OrderedLoader)


def parse(opt_path: str, is_train: bool = True, root: Optional[str] = None) -> NoneDict:
    """Load a reference-style YAML into a fully-derived NoneDict config.

    root: experiment tree root (default: ./experiments|./results under CWD).
    """
    with open(opt_path) as f:
        opt = _ordered_load(f)

    opt["is_train"] = is_train
    scale = opt.get("scale", 4)

    # datasets: key format '<phase>' or '<phase>_<n>'
    for phase_key, dataset in (opt.get("datasets") or {}).items():
        phase = phase_key.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale
        for k in list(dataset):
            if k.startswith("dataroot_") and dataset[k] is not None:
                path = osp.expanduser(dataset[k])
                dataset[k] = path
                if path.endswith(".lmdb"):
                    dataset["data_type"] = "lmdb"
        dataset.setdefault("data_type", "img")

    # network_G scale propagation
    if "network_G" in opt and opt["network_G"] is not None:
        opt["network_G"].setdefault("scale", scale)

    # path tree
    opt.setdefault("path", OrderedDict())
    for k, v in list(opt["path"].items()):
        if v is not None and ("pretrain_model" in k or "resume" in k or "root" in k):
            opt["path"][k] = osp.expanduser(str(v))
    base_root = root or opt["path"].get("root") or os.getcwd()
    opt["path"]["root"] = base_root
    name = opt.get("name", "unnamed")
    if is_train:
        experiments_root = osp.join(base_root, "experiments", name)
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_state"] = osp.join(experiments_root, "training_state")
        opt["path"]["log"] = experiments_root
        opt["path"]["val_images"] = osp.join(experiments_root, "val_images")
        if opt.get("train", {}).get("debug") or "debug" in name:
            t = opt.setdefault("train", OrderedDict())
            t["val_freq"] = 8
            opt.setdefault("logger", OrderedDict())["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(base_root, "results", name)
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root

    return dict_to_nonedict(opt)


def dict2str(opt: Mapping, indent_l: int = 1) -> str:
    """Pretty-print nested config (reference options.py:dict2str)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + f"{k}:[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + f"{k}: {v}\n"
    return msg


def check_resume(opt: Mapping, resume_iter: int) -> None:
    """Rewire pretrain paths when resume_state is given (reference
    options.py:check_resume [H]): pretrain_model_G is pointed at the
    checkpoint matching the resumed iteration."""
    if opt["path"].get("resume_state"):
        # save_network writes orbax directories named '<iter>_G' (no
        # extension) — point at exactly that path.
        opt["path"]["pretrain_model_G"] = osp.join(
            opt["path"]["models"], f"{resume_iter}_G"
        )

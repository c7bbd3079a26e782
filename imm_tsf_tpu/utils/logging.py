"""Run logging (reference lib/utils.py:39-66 get_logger + main.py:994-1015
log-path construction): per-run file + console handlers."""

from __future__ import annotations

import logging
import os


def get_logger(logpath: str, mode: str = "a", name: str = "imm_tsf_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    os.makedirs(os.path.dirname(logpath) or ".", exist_ok=True)
    fh = logging.FileHandler(logpath, mode=mode)
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(ch)
    return logger


def log_path_for(cfg) -> str:
    """reference main.py:994-1006 naming (debug when n < 12000)."""
    state = "debug" if cfg.n < 12000 else cfg.state
    if state == "debug":
        return f"logs/{cfg.dataset}_{cfg.model}_{state}.log"
    return (
        f"logs/{cfg.dataset}_{cfg.model}_{state}_{cfg.patch_size}patch_"
        f"{cfg.stride}stride_{cfg.nlayer}layer_{cfg.lr}lr.log"
    )

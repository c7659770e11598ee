"""Leveled file+stdout logging (reference: lib/utils/tools/logger.py:31-204).

Unlike the reference singleton, this is a thin wrapper over stdlib logging
with an ``info_once``-style dedup and per-process (multi-host) tagging.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS: dict[str, logging.Logger] = {}
_SEEN_ONCE: set[str] = set()


def get_logger(
    name: str = "contrastiveseg",
    log_file: Optional[str] = None,
    stdout_level: str = "info",
    logfile_level: str = "info",
    fmt: str = "%(asctime)s %(levelname)-7s %(message)s",
) -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    sh = logging.StreamHandler(sys.stdout)
    sh.setLevel(getattr(logging, stdout_level.upper()))
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)

    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setLevel(getattr(logging, logfile_level.upper()))
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)

    _LOGGERS[name] = logger
    return logger


def info_once(msg: str, name: str = "contrastiveseg") -> None:
    """Log a message at most once per process (reference Logger.info_once)."""
    if msg not in _SEEN_ONCE:
        _SEEN_ONCE.add(msg)
        get_logger(name).info(msg)

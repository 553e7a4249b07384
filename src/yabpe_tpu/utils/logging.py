"""Structured host logging (host-0 aware for multi-host runs)."""

from __future__ import annotations

import logging
import os


def _is_host_zero() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str) -> logging.Logger:
    """Logger that emits only on host 0; level via YABPE_LOG_LEVEL."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(handler)
        level = os.environ.get("YABPE_LOG_LEVEL", "WARNING").upper()
        logger.setLevel(getattr(logging, level, logging.WARNING))
        if not _is_host_zero():
            logger.setLevel(logging.ERROR)
        logger.propagate = False
    return logger


__all__ = ["get_logger"]

"""Package logging (reference log.py: ``set_logger`` / LOGGER).

The reference routes its Rust-side tracing through a Python logger the
user can replace; here every manifest commit (each version of every
dataset flows through ``manifest.commit``) logs at INFO and commit
conflicts at DEBUG — executor-side work logs through Spark's own log4j,
which ``set_logger`` cannot and should not capture.
"""

from __future__ import annotations

import logging

LOGGER = logging.getLogger("lance_spark")


def set_logger(
    file_path: str = "pylance.log",
    name: str = "lance_spark",
    level: int = logging.INFO,
    format_string: str | None = None,
    log_handler: logging.Handler | None = None,
) -> logging.Logger:
    """Configure the package logger (reference log.py ``set_logger``)."""
    global LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if format_string is None:
        format_string = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    handler = log_handler or logging.FileHandler(file_path)
    handler.setFormatter(logging.Formatter(format_string))
    # replace, don't stack: repeated set_logger calls must not duplicate
    # every line once per call
    for h in list(logger.handlers):
        logger.removeHandler(h)
    logger.addHandler(handler)
    LOGGER = logger
    return logger


def get_log_level() -> str:
    """Effective package log level name (reference log.py get_log_level)."""
    import logging

    return logging.getLevelName(LOGGER.getEffectiveLevel())

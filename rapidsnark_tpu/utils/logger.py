"""Phase-labeled logging (reference component §2.8, src/logger.{hpp,cpp}).

The reference ships a singleton pthread logger with levels
ERROR/ALARM/ALWAYS/INFO/BUFFER/TRACE/DEBUG, console or file sink
(`MyLogFile.log`), and runtime level switches. Python's logging module
already provides the machinery; this wraps it with the same knobs:

    RSTPU_LOG_LEVEL = error|info|trace|debug   (default info)
    RSTPU_LOG_FILE  = <path>                   (default: console)

`phase(name)` context manager emits the stage-boundary timeline the
reference gets from LOG_TRACE lines through prove() (groth16.cpp:51-202),
so phase timelines stay comparable.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

TRACE = 5
logging.addLevelName(TRACE, "TRACE")

_LEVELS = {
    "error": logging.ERROR,
    "alarm": logging.CRITICAL,
    "always": logging.CRITICAL,
    "info": logging.INFO,
    "buffer": logging.DEBUG,
    "trace": TRACE,
    "debug": logging.DEBUG,
}

_logger = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        log = logging.getLogger("rapidsnark_tpu")
        level = _LEVELS.get(os.environ.get("RSTPU_LOG_LEVEL", "info").lower(),
                            logging.INFO)
        log.setLevel(level)
        path = os.environ.get("RSTPU_LOG_FILE")
        handler = (logging.FileHandler(path) if path
                   else logging.StreamHandler())
        handler.setFormatter(logging.Formatter(
            "%(asctime)s.%(msecs)03d %(levelname)s %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S"))
        log.addHandler(handler)
        log.trace = lambda msg, *a: log.log(TRACE, msg, *a)  # type: ignore
        _logger = log
    return _logger


@contextlib.contextmanager
def phase(name: str, sink: dict | None = None):
    """Stage-boundary timeline marker (mirrors groth16.cpp LOG_TRACE)."""
    log = get_logger()
    log.log(TRACE, "%s begin", name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = dt
        log.log(TRACE, "%s end (%.3fs)", name, dt)

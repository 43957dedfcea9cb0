"""Namespaced engine logger with idempotent handler setup.

Parity target: `/root/reference/pyspark_stream/utils/logger.py:1-98`
(framework logger + dotted child loggers, single stream handler no
matter how often the factory is called). Re-expressed, not copied:
one module-level configure guard instead of handler-list inspection,
and the formatter carries the engine name.

Engine modules log through this namespace so an operator's driver-side
messages (e.g. iterative-loop round counts in operators/graph.py, or
foreachBatch merge stats) can be silenced or redirected in one place
without touching Spark's own log4j JVM logging.

Logs go to STDERR: stdout belongs to data contracts (bench.py's
one-JSON-line protocol; any CLI piping results), and a query that
logs its documented corpus cap must not corrupt them.
"""

from __future__ import annotations

import logging
import sys

ROOT_LOGGER_NAME = "local_stream_stack_spark"

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(
    name: str | None = None, level: int | None = None
) -> logging.Logger:
    """Return the engine's base logger, or a dotted child of it.

    The stderr handler + formatter are attached to the base logger
    exactly once (children propagate to it), so repeated calls — one
    per module import is typical — never duplicate output lines.
    ``level`` sets the returned logger's level when given; children
    otherwise inherit the base logger's INFO.
    """
    base = logging.getLogger(ROOT_LOGGER_NAME)
    if not any(
        isinstance(h, logging.StreamHandler) and h.stream is sys.stderr
        for h in base.handlers
    ):
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        base.addHandler(handler)
        base.setLevel(logging.INFO)
    logger = logging.getLogger(f"{ROOT_LOGGER_NAME}.{name}") if name else base
    if level is not None:
        logger.setLevel(level)
    return logger

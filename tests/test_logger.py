"""Logger factory: namespacing, handler idempotence, level control
(reference parity: pyspark_stream/utils/logger.py)."""

import logging

from local_stream_stack_spark.utils import get_logger
from local_stream_stack_spark.utils.logger import ROOT_LOGGER_NAME


def test_handler_not_duplicated_across_calls():
    base = get_logger()
    n = len(base.handlers)
    for _ in range(5):
        get_logger()
        get_logger("child")
        get_logger("child.grandchild")
    assert len(base.handlers) == n == 1


def test_child_loggers_namespace_and_propagate(capsys):
    child = get_logger("kafka", level=logging.DEBUG)
    assert child.name == f"{ROOT_LOGGER_NAME}.kafka"
    assert child.level == logging.DEBUG
    child.info("hello from child")
    out = capsys.readouterr().err
    assert "hello from child" in out
    assert f"{ROOT_LOGGER_NAME}.kafka" in out
    # exactly one handler fired -> exactly one line
    assert out.count("hello from child") == 1


def test_base_level_filters_children_by_default(capsys):
    fresh = get_logger("quiet.module")
    fresh.debug("should not appear")  # inherits INFO from base
    assert "should not appear" not in capsys.readouterr().err

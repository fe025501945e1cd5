"""Structured-logging contract for pipeline plans.

The reference gives every task module a logging contract, enforced by a
parallel test file per module (SURVEY §5.6;
tests/test_import_dataset_logging.py, tests/test_*_logging.py): the
task's input payload is logged as one JSON document at DEBUG under an
``"event"`` key, and failures are logged as JSON under an ``"error"``
key at WARNING, so log pipelines can parse every line without regexes.

Spark analog: log points live on the DRIVER at plan-construction /
action boundaries (executors don't share the driver's logger, and a
per-row log would be a scale bug, not a feature).  The payload is the
plan's arguments — never data, never a count that would trigger a job.

Enforced by tests/test_plan_logging.py, the parallel-file analog of the
reference tier.
"""

from __future__ import annotations

import json
import logging

EVENT_KEY = "event"
ERROR_KEY = "error"


def log_event(module: str, payload: dict) -> None:
    """DEBUG-log a task's input payload as ``{"event": payload}``."""
    logging.getLogger(module).debug(json.dumps({EVENT_KEY: payload}, sort_keys=True))


def log_error(module: str, message: str) -> None:
    """WARNING-log a failure as ``{"error": message}``."""
    logging.getLogger(module).warning(
        json.dumps({ERROR_KEY: message}, sort_keys=True)
    )

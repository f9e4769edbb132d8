"""Structured logging for light-vllm-tpu.

TPU-native counterpart of the reference's logging setup
(reference: light_vllm/logger.py, light_vllm/logging/formatter.py).
"""

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_configured = False


class _MultilineFormatter(logging.Formatter):
    """Indent continuation lines so multi-line messages stay readable."""

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if "\n" in msg:
            header, _, _ = msg.partition(record.getMessage())
            msg = msg.replace("\n", "\n" + " " * len(header))
        return msg


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    root = logging.getLogger("light_vllm_tpu")
    level = os.environ.get("LVT_LOGGING_LEVEL", "INFO").upper()
    root.setLevel(level)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(_MultilineFormatter(_FORMAT, _DATE_FORMAT))
        root.addHandler(handler)
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("light_vllm_tpu"):
        name = f"light_vllm_tpu.{name}"
    return logging.getLogger(name)

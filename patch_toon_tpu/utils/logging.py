"""Colored console logging, mirroring the reference's Hydra colorlog
overrides (reference config/inference.yaml:6-7, config/training.yaml) at
the output level: level name colored by severity, logger name in cyan.

Plain `logging` stdlib — colors only when the stream is a TTY (or forced),
so piped/file output stays clean. No colorlog/hydra dependency.
"""

from __future__ import annotations

import logging
import os
import sys

_LEVEL_COLORS = {
    logging.DEBUG: "\033[35m",     # magenta
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
    logging.CRITICAL: "\033[1;31m",
}
_CYAN = "\033[36m"
_RESET = "\033[0m"


class ColorFormatter(logging.Formatter):
    """`[HH:MM:SS][name][LEVEL] - msg`, colorlog-style."""

    def __init__(self, use_color: bool):
        super().__init__(datefmt="%H:%M:%S")
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        t = self.formatTime(record, self.datefmt)
        name, level = record.name, record.levelname
        if self.use_color:
            c = _LEVEL_COLORS.get(record.levelno, "")
            name = f"{_CYAN}{name}{_RESET}"
            level = f"{c}{level}{_RESET}"
        msg = record.getMessage()
        if record.exc_info:
            msg = f"{msg}\n{self.formatException(record.exc_info)}"
        return f"[{t}][{name}][{level}] - {msg}"


def configure_logging(level: int = logging.INFO) -> None:
    """Install a colorlog-style root handler (force-replaces any handler a
    plugin import installed first). Color auto-detects a TTY; set
    NO_COLOR=1 to force off, FORCE_COLOR=1 to force on."""
    if os.environ.get("NO_COLOR"):
        use_color = False
    elif os.environ.get("FORCE_COLOR"):
        use_color = True
    else:
        use_color = hasattr(sys.stderr, "isatty") and sys.stderr.isatty()
    handler = logging.StreamHandler()
    handler.setFormatter(ColorFormatter(use_color))
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    root.addHandler(handler)
    root.setLevel(level)

"""Metrics & logging (SURVEY.md §5: the reference's only observability is
stderr prints and a twiddle-count warning, src/highSpeedFFT.c:2308-2312).

Process-wide counters with zero overhead when unread, plus an opt-in logger.
Counters are incremented from the plan layer (builds, cache hits) and can be
incremented from user code; snapshot with :func:`get_metrics`.
"""

from __future__ import annotations

import collections
import logging
import threading
from typing import Dict

_LOCK = threading.Lock()
_COUNTERS: Dict[str, int] = collections.defaultdict(int)

logger = logging.getLogger("mixed_radix_fft_tpu")
logger.addHandler(logging.NullHandler())


def incr(name: str, by: int = 1) -> None:
    with _LOCK:
        _COUNTERS[name] += by


def get_metrics() -> Dict[str, int]:
    with _LOCK:
        return dict(_COUNTERS)


def reset_metrics() -> None:
    with _LOCK:
        _COUNTERS.clear()


def enable_logging(level: int = logging.INFO) -> None:
    """Route library events (plan builds, fallbacks) to stderr."""
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("[%(name)s] %(levelname)s %(message)s")
    )
    logger.addHandler(handler)
    logger.setLevel(level)

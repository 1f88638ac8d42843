"""Debug / reliability utilities (SURVEY §5.2-5.3 — absent in the reference):

- ``nan_check``: jax.debug_nans mode toggle + explicit pytree NaN audit;
- ``StepWatchdog``: wall-clock watchdog around device steps — fires a
  callback (default: log + dump stacks) if a step exceeds the deadline, the
  single-controller analogue of a collective-deadlock detector;
- ``profile``: context manager around ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import faulthandler
import sys
import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .logging import logger


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def find_nonfinite(tree, prefix: str = "") -> list:
    """Return keypaths of non-finite leaves (host-side audit)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        arr = jax.device_get(leaf)
        try:
            if not bool(jnp.isfinite(arr).all()):
                bad.append(key)
        except TypeError:
            continue
    return bad


class StepWatchdog:
    """Fires if ``ping()`` isn't called within ``timeout_s`` — a hung step
    (deadlocked collective, wedged DMA, dead remote) gets surfaced instead of
    hanging the job silently."""

    def __init__(self, timeout_s: float = 300.0,
                 on_timeout: Optional[Callable[[], None]] = None):
        self.timeout_s = timeout_s
        self.on_timeout = on_timeout or self._default_handler
        self._timer: Optional[threading.Timer] = None
        self._stopped = False

    def _default_handler(self):
        logger.error("watchdog: no step completed in %.0fs — dumping stacks",
                     self.timeout_s)
        faulthandler.dump_traceback(file=sys.stderr)

    def _arm(self):
        self._timer = threading.Timer(self.timeout_s, self.on_timeout)
        self._timer.daemon = True
        self._timer.start()

    def ping(self):
        """Call after each completed step."""
        if self._timer:
            self._timer.cancel()
        if not self._stopped:
            self._arm()

    def __enter__(self):
        self._arm()
        return self

    def __exit__(self, *exc):
        self._stopped = True
        if self._timer:
            self._timer.cancel()
        return False


@contextlib.contextmanager
def profile(trace_dir: Optional[str]):
    """jax.profiler trace scope (Perfetto/XPlane dumps under trace_dir)."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

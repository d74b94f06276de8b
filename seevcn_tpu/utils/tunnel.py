"""Tunnel/remote-backend failure classification.

The TPU backend in this environment is reached through an HTTP tunnel
(`remote_compile` / dispatch endpoints). Long runs die on two very
different failure classes that need opposite handling:

* **Permanent** — `HTTP 413: ... length limit exceeded`: the compile
  payload (serialized HLO, including any arrays baked into the jaxpr as
  closure constants) exceeds the tunnel's request-body limit. This is
  deterministic: retrying re-sends the identical payload and fails
  identically (round 4 burned 4 blind retries / 47 minutes on exactly
  this). The fix is structural — pass large arrays as jit *arguments*,
  never close over them.
* **Transient** — `UNAVAILABLE`, connection resets, 5xx: the tunnel or
  chip hiccuped; a bounded retry with checkpoint resume is the right
  recovery (mirrors the reference's restart-based recovery,
  detector3d/tools/train.py:130-140).

`classify_tunnel_error` maps an exception to one of
``"payload_too_large" | "transient" | "other"``; scripts translate that
into distinct exit codes so runbooks only retry what retrying can fix.
"""
from __future__ import annotations

import os
import re
import sys
import threading
import time

# the exact shapes seen in runs/da_tpu_runbook3.log and bench captures
_PAYLOAD_RE = re.compile(
    r"HTTP\s*413|length limit exceeded|payload\s*too\s*large", re.I)
_TRANSIENT_RE = re.compile(
    r"UNAVAILABLE|DEADLINE_EXCEEDED|HTTP\s*50[234]|connection reset"
    r"|connection refused|socket closed|broken pipe|failed to connect"
    r"|RESOURCE_EXHAUSTED.*hbm", re.I)

# exit codes for scripts (runbooks branch on these)
EXIT_PERMANENT = 2   # do NOT retry
EXIT_TRANSIENT = 3   # bounded retry with --resume is appropriate


def classify_tunnel_error(exc: BaseException | str) -> str:
    """Classify a backend/tunnel failure.

    Returns ``"payload_too_large"`` (deterministic; never retry),
    ``"transient"`` (bounded retry + resume), or ``"other"``.
    """
    msg = str(exc)
    if _PAYLOAD_RE.search(msg):
        return "payload_too_large"
    if _TRANSIENT_RE.search(msg):
        return "transient"
    return "other"


def jaxpr_const_bytes(fn, *args, **kwargs) -> int:
    """Bytes of array constants baked into ``fn``'s jaxpr for ``args``.

    This is the number that blows the remote_compile request-body limit:
    closure-captured device/numpy arrays are serialized into the compile
    payload. Use it in a fail-fast diagnostic so an HTTP 413 names its
    cause instead of being retried blindly.
    """
    import jax

    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    total = 0
    for c in closed.consts:
        size = getattr(c, "size", None)
        dt = getattr(c, "dtype", None)
        if size is not None and dt is not None:
            total += int(size) * dt.itemsize
    return total


class Watchdog:
    """Convert a silent tunnel HANG into a classified transient failure.

    The exception classifier above only helps when the backend *raises*.
    The other observed failure mode is a readback that never returns: the
    gating ``float(...)`` blocks in C++ forever, no exception, no log
    progress (det_raw3 stalled 27 min at step 6400 this way; the only
    backstop was a 2-hour runbook ``timeout``). ``signal.alarm`` cannot
    interrupt a C call that doesn't check Python signals, so the watchdog
    is a daemon THREAD: callers ``beat()`` after every unit of progress,
    and if no beat arrives within ``deadline_s`` the thread prints a
    transient-failure diagnosis and hard-exits the process with
    ``EXIT_TRANSIENT`` — the same code the exception path uses — so the
    surrounding runbook retries with ``--resume`` in minutes instead of
    hours. Progress-based, not per-call: compiles legitimately take
    minutes, so the deadline should comfortably exceed the slowest
    expected beat-to-beat gap (compile + first step), default 15 min.
    """

    def __init__(self, deadline_s: float = 900.0, what: str = "progress",
                 on_stall=None):
        self.deadline_s = float(deadline_s)
        self.what = what
        # injectable for tests; production default hard-exits because the
        # main thread is unrecoverably blocked inside the runtime
        self._on_stall = on_stall or self._default_stall
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def _default_stall(self, idle_s: float) -> None:
        print(f"WATCHDOG: no {self.what} for {idle_s:.0f}s "
              f"(deadline {self.deadline_s:.0f}s) — the tunnel readback is "
              "hung (no exception will ever surface). Exiting "
              f"{EXIT_TRANSIENT} so the caller retries with --resume.",
              file=sys.stderr, flush=True)
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(EXIT_TRANSIENT)

    def beat(self) -> None:
        """Record progress; resets the stall timer."""
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def _watch(self) -> None:
        while not self._stop.wait(min(5.0, self.deadline_s / 4)):
            idle = time.monotonic() - self._last
            if idle > self.deadline_s:
                self._on_stall(idle)
                return


def explain_tunnel_error(exc: BaseException, const_bytes: int | None = None) -> str:
    """One-paragraph operator-facing diagnosis for a classified failure."""
    kind = classify_tunnel_error(exc)
    if kind == "payload_too_large":
        hint = (f" The traced function carries ~{const_bytes / 1e6:.0f} MB of "
                "array constants baked into its jaxpr;" if const_bytes
                else " Likely cause: large arrays closed over by a jitted "
                     "function are serialized into the compile payload;")
        return ("PERMANENT tunnel failure (compile payload exceeds the "
                "request-body limit). Retrying re-sends the identical "
                f"payload and cannot succeed.{hint} pass them as jit "
                "arguments instead.")
    if kind == "transient":
        return ("TRANSIENT tunnel/backend failure. A bounded retry that "
                "resumes from the latest checkpoint is appropriate.")
    return "Unclassified failure; inspect the traceback."

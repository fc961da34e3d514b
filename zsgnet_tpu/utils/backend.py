"""Backend-init watchdog — probe ``jax.devices()`` without risking a hang.

A dead remote-accelerator tunnel (observed repeatedly on this repo's
axon TPU tunnel) hangs backend initialization INDEFINITELY — even
``jax.devices()`` never returns. Anything that must not wedge (the
driver's bench/compile-check entrypoints, the doctor CLI) probes through
here: the init runs on a daemon thread with a deadline, optionally
retried (tunnels flap), and failure surfaces as an exception instead of
a frozen process. The leaked probe thread is daemonic, so process exit
is never blocked by it.
"""

from __future__ import annotations

import threading
import time


def probe_devices(timeout_s: float = 60.0):
    """One watchdogged ``jax.devices()`` attempt.

    Returns ``(devices, None)`` on success, ``(None, exc)`` when init
    raised, and ``(None, None)`` when it is still hung at the deadline.
    """
    import jax

    box: dict = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — reported to the caller
            box["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" in box:
        return box["devices"], None
    return None, box.get("error")


def devices_or_die(timeout_s: float = 600.0, retries: int = 3, tag: str = ""):
    """Devices, or ``SystemExit`` with a diagnosable message — never a hang.

    Hung attempts are retried after a pause (tunnels flap); a hard init
    error aborts immediately (it will not heal by retrying in-process).
    """
    prefix = f"{tag}: " if tag else ""
    for attempt in range(1, retries + 1):
        devices, err = probe_devices(timeout_s)
        if devices is not None:
            return devices
        reason = err if err is not None else f"still hung after {timeout_s:.0f}s"
        print(f"{prefix}device init attempt {attempt}/{retries} failed: "
              f"{reason}", flush=True)
        if err is not None:
            break
        if attempt < retries:
            time.sleep(30)
    raise SystemExit(
        f"{prefix}no usable backend (remote-TPU tunnel down?) — refusing "
        "to hang or fabricate a result; rerun when the chip is reachable"
    )

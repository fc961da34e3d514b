"""Environment self-check: ``python -m zsgnet_tpu.doctor``.

Answers "will this machine run the framework, and at what capability?"
before a user burns an hour discovering it the hard way (the reference
leaves this to a requirements.txt and a stack trace; SURVEY.md §2.13).
Checks run in dependency order and NEVER hang: the backend probe — the
one step that can block forever when a remote-TPU tunnel is down, the
exact failure mode this repo's own TPU outages exhibit — runs on a
daemon thread with a deadline and reports a timeout instead of wedging.

    python -m zsgnet_tpu.doctor [--platform=cpu] [--timeout=60] [--smoke=false]

Exit code: 0 when every REQUIRED check passes (imports, config, backend,
jit smoke), 1 otherwise. Optional capabilities (native image pipeline,
JPEG support, multi-device mesh, TPU compiler options) print their
status but do not fail the doctor — the framework degrades gracefully
without them (Python decode fallback, single-device, default VMEM).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import traceback

_OK = "  ok  "
_BAD = " FAIL "
_OPT = " info "


def _row(status: str, name: str, detail: str = "") -> None:
    print(f"[{status}] {name:32s} {detail}", flush=True)


def _versions() -> bool:
    import importlib

    good = True
    _row(_OK, "python", sys.version.split()[0])
    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = importlib.import_module(mod)
            _row(_OK, mod, getattr(m, "__version__", "?"))
        except Exception as e:  # noqa: BLE001 — report, don't crash
            _row(_BAD, mod, f"import failed: {e}")
            good = False
    return good


def _config() -> bool:
    try:
        from zsgnet_tpu.config import get_default_cfg

        cfg = get_default_cfg()
        _row(_OK, "config", f"model={cfg.mdl_to_use} resize={cfg.resize_img} "
                            f"dtype={cfg.compute_dtype} vmem_kib={cfg.tpu_vmem_kib}")
        return True
    except Exception as e:  # noqa: BLE001
        _row(_BAD, "config", f"{e}")
        return False


def _backend(timeout_s: float, platform: str | None) -> "object | None":
    """Probe devices on a watchdog thread (``utils.backend``) — a dead
    remote-TPU tunnel hangs backend init indefinitely; report that
    instead of reproducing it."""
    import jax

    from zsgnet_tpu.utils.backend import probe_devices

    if platform:
        jax.config.update("jax_platforms", platform)
    t0 = time.time()
    devs, err = probe_devices(timeout_s)
    if devs is None and err is None:
        _row(_BAD, "backend", f"device init still hung after {timeout_s:.0f}s "
                              "— remote-TPU tunnel down? Retry, or force "
                              "--platform=cpu to work chip-free")
        return None
    if err is not None:
        _row(_BAD, "backend", f"device init failed: {err}")
        return None
    plat = devs[0].platform
    kind = getattr(devs[0], "device_kind", "?")
    _row(_OK, "backend", f"{len(devs)}x {plat} ({kind}) in {time.time() - t0:.1f}s")
    if len(devs) > 1:
        _row(_OPT, "multi-device", f"{len(devs)} devices — data-parallel and "
                                   "mesh_spatial modes available")
    else:
        _row(_OPT, "multi-device", "single device (tests force an 8-CPU mesh "
                                   "via XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return devs


def _jit_smoke(devs) -> bool:
    import jax
    import jax.numpy as jnp

    try:
        t0 = time.time()
        x = jnp.ones((256, 256), jnp.bfloat16)
        # Sum in f32: a backend that reduces bf16 in bf16 stagnates the
        # accumulator near 2^17 — don't fail a healthy machine on that.
        y = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())(x)
        val, want = float(y), float(256 ** 3)
        _row(_OK, "jit smoke (256² bf16 matmul)",
             f"= {val:.0f} in {time.time() - t0:.1f}s (first compile)")
        return abs(val - want) <= 0.01 * want
    except Exception as e:  # noqa: BLE001
        _row(_BAD, "jit smoke", f"{e}")
        return False


def _compiler_options(devs) -> None:
    from zsgnet_tpu.config import get_default_cfg
    from zsgnet_tpu.utils.compile import compiler_options_for

    opts = compiler_options_for(get_default_cfg())
    if devs and devs[0].platform == "tpu" and opts:
        import jax
        import jax.numpy as jnp

        try:
            jax.jit(lambda a: a + 1, compiler_options=opts)(jnp.zeros(8))
            _row(_OPT, "tpu compiler options", f"accepted: {opts}")
        except Exception as e:  # noqa: BLE001
            _row(_OPT, "tpu compiler options", f"REJECTED ({e}) — runs use defaults")
    else:
        _row(_OPT, "tpu compiler options",
             "n/a on this backend (scoped-VMEM tuning is TPU-only)")


def _native() -> None:
    try:
        from zsgnet_tpu.data import native

        if native.available():
            jpeg = "with JPEG" if native.has_jpeg() else "PNG-only (no libjpeg)"
            _row(_OPT, "native image pipeline", f"libzsgimage.so loaded, {jpeg}")
        else:
            _row(_OPT, "native image pipeline",
                 "unavailable — Python/Pillow decode fallback (slower host path; "
                 "build: cc -O2 -shared -fPIC csrc/zsg_image.cpp)")
    except Exception as e:  # noqa: BLE001
        _row(_OPT, "native image pipeline", f"probe failed: {e}")


def _scratch() -> bool:
    try:
        from zsgnet_tpu.config import get_default_cfg

        tmp = get_default_cfg().tmp_path
        os.makedirs(tmp, exist_ok=True)
        with tempfile.NamedTemporaryFile(dir=tmp, prefix="doctor_"):
            pass
        _row(_OK, "scratch dir (cfg.tmp_path)", tmp)
        return True
    except Exception as e:  # noqa: BLE001
        _row(_BAD, "scratch dir", f"not writable: {e}")
        return False


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    overrides = dict(a[2:].split("=", 1) for a in argv if a.startswith("--") and "=" in a)
    timeout_s = float(overrides.get("timeout", "60"))
    platform = overrides.get("platform") or None
    smoke = overrides.get("smoke", "true").lower() in ("1", "true", "yes")

    print("zsgnet_tpu doctor — environment self-check", flush=True)
    good = _versions()
    good &= _config()
    good &= _scratch()
    devs = _backend(timeout_s, platform)
    good &= devs is not None
    if devs is not None and smoke:
        good &= _jit_smoke(devs)
        _compiler_options(devs)
    _native()
    print(("all required checks passed" if good else
           "REQUIRED CHECKS FAILED — see rows above"), flush=True)
    return 0 if good else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:  # noqa: BLE001 — the doctor itself must not stack-trace
        traceback.print_exc()
        sys.exit(1)

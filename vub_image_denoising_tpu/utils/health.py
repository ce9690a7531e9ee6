"""Device-runtime health probes (failure detection, SURVEY.md §5 A4).

The reference's failure handling is a whole-run ``try/except`` plus
checkpoint-resume (diffusion_RDUnet.py:291-315,180-193).  On this TPU runtime
a sharper failure mode exists: the accelerator's EXEC path can die while
device *enumeration* still answers — ``jax.devices()`` returns the chip but
every client's first executed op blocks forever in a futex wait (observed
round 5; round 3 logged an 8+ h outage of the same tunnel).  A hung C call
cannot be timed out in-process, so the probe must be a subprocess.

``probe_device_exec`` runs a tiny *executed* matmul (not just enumeration) in
a child interpreter under a hard timeout and reports (ok, seconds, detail).
Orchestration (queue scripts, trainers with retry loops) can use it to tell
"runtime dead — wait, don't burn the timeout" from "slow remote compile —
keep waiting" from "healthy".
"""

import subprocess
import sys
import time

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((128, 128))\n"
    "print('EXEC_OK', float(jax.device_get((x @ x)[0, 0])))\n"
)


def probe_device_exec(timeout_s: float = 90.0, platform: str = ""):
    """Return (ok, seconds, detail) for the device EXEC path.

    ``ok`` is True only if a real executed op round-tripped inside
    ``timeout_s``.  ``detail`` is the child's last output line (or
    ``"timeout"`` / the exception text).  ``platform`` optionally pins
    JAX_PLATFORMS in the child (e.g. ``"cpu"`` for tests).
    """
    import os

    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
        # the axon sitecustomize pre-imports jax at interpreter start and
        # captures JAX_PLATFORMS before user code runs; dropping the pool var
        # disables it so the pin takes effect (CLAUDE.md)
        env.pop("PALLAS_AXON_POOL_IPS", None)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], env=env,
            capture_output=True, text=True, timeout=timeout_s,
        )
        dt = time.time() - t0
        last = (out.stdout.strip().splitlines() or [""])[-1]
        return ("EXEC_OK" in last, dt, last or out.stderr.strip()[-200:])
    except subprocess.TimeoutExpired:
        return (False, time.time() - t0, "timeout")
    except Exception as e:  # interpreter spawn failure etc.
        return (False, time.time() - t0, f"{type(e).__name__}: {e}")


def main(argv=None):
    """CLI: exit 0 iff the exec path is healthy (for shell `if` guards)."""
    timeout_s = float(argv[0]) if argv else 90.0
    ok, dt, detail = probe_device_exec(timeout_s)
    print(f"device_exec ok={ok} in {dt:.1f}s: {detail}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

"""Pre-flight idle probe: refuse to start timing while the hypervisor is
throttling this box.

Why (round-4 verdict item 1): BENCH_r04 was recorded in a throttled
window — unchanged JVM-only queries ran 1.4-1.7x slower than round 3,
poisoning every round-over-round comparison. The documented VM behavior
(BENCH/BASELINE.md, SCALE.md) is that the hypervisor down-clocks under
sustained wide load with up to 2x run-to-run swings; a benchmark taken
in such a window records throttle state, not engine state.

Mechanism: measure single-process raw-python burn throughput (no Spark,
no JVM — pure interpreter loop, so the number reflects only the clock
the hypervisor is currently granting). Compare against the best rate
ever observed on this box (a ratchet persisted in
BENCH/idle_calibration.json — the first quiet window sets the bar, and
any later faster window raises it). If the current rate is below
``threshold`` (default 0.93) of the best-ever rate, the window is
throttled: sleep and re-probe until it recovers or ``max_wait_s`` is
exhausted. Callers embed the probe verdict in their output JSON either
way, so a recording taken under protest is self-describing instead of
silently wrong.

Single-process is the right probe shape: per the VM-noise protocol the
box grants boosted clocks to narrow load, so a *degraded single-core*
rate means the box is globally throttled or busy — exactly the state in
which the round-4 sweeps failed (their in-window raw-python ceilings
collapsed to 0.64-0.77).
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CALIBRATION_PATH = os.path.join(REPO, "BENCH", "idle_calibration.json")

_BURN_ITERS = 30_000_000


def _burn_once() -> float:
    """One single-process burn; returns iters/sec."""
    t0 = time.perf_counter()
    x = 0
    for _ in range(_BURN_ITERS):
        x += 1
    return _BURN_ITERS / (time.perf_counter() - t0)


def burn_rate(samples: int = 2) -> float:
    """Best-of-``samples`` single-process burn rate (iters/sec).

    Best-of, not median: the probe asks "what clock CAN the box grant
    right now" — a transient dip in one sample must not flag a quiet
    window as throttled.
    """
    return max(_burn_once() for _ in range(samples))


def _host_key() -> str:
    """Stable identifier for the machine the ratchet belongs to. The
    calibration file is committed, so without host keying a slower box
    inherits THIS box's best-ever rate, can never clear the threshold,
    and burns the full probe wait on every bench (round-6 advice fix)."""
    import platform

    return f"{platform.node()}/{os.cpu_count()}cpu"


def _read_calibration() -> dict:
    try:
        with open(CALIBRATION_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _load_best() -> float:
    data = _read_calibration()
    try:
        return float(data["hosts"][_host_key()]["best_burn_rate"])
    except (KeyError, TypeError, ValueError):
        # no entry for THIS host: seed fresh (first probe sets the bar
        # at ratio 1.0) instead of inheriting another box's ceiling
        return 0.0


def _store_best(rate: float) -> None:
    os.makedirs(os.path.dirname(CALIBRATION_PATH), exist_ok=True)
    data = _read_calibration()
    hosts = data.get("hosts")
    if not isinstance(hosts, dict):
        hosts = {}
    hosts[_host_key()] = {
        "best_burn_rate": round(rate, 1),
        "burn_iters": _BURN_ITERS,
    }
    tmp = CALIBRATION_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "hosts": hosts,
                "note": (
                    "monotonic best-ever single-process python burn rate "
                    "PER HOST; idle_probe ratchets each host's bar upward "
                    "in quiet windows and rates current windows against "
                    "that host's own bar"
                ),
            },
            f,
            indent=1,
        )
    os.replace(tmp, CALIBRATION_PATH)


def probe(
    threshold: float = 0.93,
    max_wait_s: float = 240.0,
    sleep_s: float = 30.0,
    verbose: bool = True,
) -> dict:
    """Block until the box looks idle or ``max_wait_s`` is spent.

    Returns a dict for embedding in benchmark output:
    ``{"ok": bool, "ratio": float, "rate": float, "best_rate": float,
    "waited_s": float, "threshold": float}``. ``ok=False`` means the
    caller is proceeding in a window the probe could not clear —
    record it, don't trust round-over-round deltas from it.
    """
    waited = 0.0
    best = _load_best()
    while True:
        rate = burn_rate()
        if rate > best:
            best = rate
            _store_best(best)
        ratio = rate / best if best else 1.0
        ok = ratio >= threshold
        if verbose:
            print(
                f"[idle_probe] burn {rate/1e6:.1f}M it/s, best "
                f"{best/1e6:.1f}M, ratio {ratio:.3f} "
                f"({'OK' if ok else 'THROTTLED'})",
                flush=True,
            )
        if ok or waited >= max_wait_s:
            return {
                "ok": ok,
                "ratio": round(ratio, 3),
                "rate": round(rate, 1),
                "best_rate": round(best, 1),
                "waited_s": round(waited, 1),
                "threshold": threshold,
            }
        step = min(sleep_s, max_wait_s - waited)
        time.sleep(step)
        waited += step


if __name__ == "__main__":
    print(json.dumps(probe()))

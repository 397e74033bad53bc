"""Per-machine benchmark score database with regression detection.

Analog of the reference's verify-tool benchmark database
(tutorials/verify/verify.cpp:453-517): every benchmark run is compared
against the best score this machine has ever produced; a run below
best * (1 - tolerance) is flagged as a REGRESSION. Scores persist in a
JSON file keyed by (hostname, device kind, benchmark name) so different
machines/chips never pollute each other's baselines.

Usage:
    from embree_tpu.tools.benchdb import record
    verdict = record("incoherent_rays", 12.3, unit="Mrays/s")
    # verdict: {"best": ..., "regression": bool, "improved": bool}

    python -m embree_tpu.tools.benchdb            # list scores
    python -m embree_tpu.tools.benchdb --reset    # clear this machine
"""
from __future__ import annotations

import json
import os
import platform
import time
from typing import Optional

DEFAULT_PATH = os.environ.get(
    "EMBREE_TPU_BENCH_DB",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".benchscores.json"))
TOLERANCE = 0.10      # >10% below the best score => regression


def _machine_key() -> str:
    dev = "cpu"
    try:
        import jax
        dev = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        pass
    return f"{platform.node()}::{dev}"


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def record(name: str, value: float, unit: str = "",
           higher_is_better: bool = True, path: Optional[str] = None,
           tolerance: float = TOLERANCE) -> dict:
    """Record a benchmark result; returns the verdict vs the stored best.

    The stored best only moves in the improving direction (verify.cpp
    keeps per-machine maxima); a regression run is recorded in `last`
    but does not lower the bar.
    """
    path = path or DEFAULT_PATH
    db = _load(path)
    mk = _machine_key()
    machine = db.setdefault(mk, {})
    entry = machine.setdefault(name, {})
    best = entry.get("best")
    better = (best is None or
              (value > best if higher_is_better else value < best))
    worse_frac = 0.0
    if best:
        worse_frac = ((best - value) / best if higher_is_better
                      else (value - best) / best)
    regression = best is not None and worse_frac > tolerance
    if better:
        entry["best"] = value
    entry["last"] = value
    entry["unit"] = unit
    entry["higher_is_better"] = higher_is_better
    entry["timestamp"] = time.time()
    entry["runs"] = entry.get("runs", 0) + 1
    try:
        with open(path, "w") as f:
            json.dump(db, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return {"best": entry["best"], "regression": bool(regression),
            "improved": bool(better and best is not None)}


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default=DEFAULT_PATH)
    ap.add_argument("--reset", action="store_true",
                    help="clear this machine's scores")
    args = ap.parse_args(argv)
    db = _load(args.path)
    if args.reset:
        db.pop(_machine_key(), None)
        with open(args.path, "w") as f:
            json.dump(db, f, indent=1, sort_keys=True)
        print(f"cleared {_machine_key()}")
        return
    for mk, scores in db.items():
        print(mk)
        for name, e in sorted(scores.items()):
            print(f"  {name:30s} best {e.get('best'):>10.3f} "
                  f"last {e.get('last'):>10.3f} {e.get('unit','')} "
                  f"({e.get('runs', 0)} runs)")


if __name__ == "__main__":
    main()

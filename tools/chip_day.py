"""One-command on-chip session for the moment the axon tunnel returns.

Round-4 has several decisions waiting on chip evidence (built while the
tunnel was down all session; see CLAUDE.md round-4 notes).  This script runs
them in priority order so a short window of chip availability is spent on
the record first and the A/Bs second:

  1. `python bench.py`            — restore the driver scoreboard (BENCH_r04
     inputs: per-size vs-builtin sweep, NUFFT, SHT, Rader, sosfilt, roofline).
  2. `tune.py rader 1009 64`      — Rader vs Bluestein (flop model says ~2x;
     SpectralConfig.rader="off" is the fallback lever if it loses).
  3. `tune.py sht 256 16`         — re-confirm Hermitian fast path + record
     the compensated-recurrence cost at L=256.

Each step is bounded by a timeout and failures don't stop the sequence.
Run from the repo root:  python tools/chip_day.py [--quick]
"""

from __future__ import annotations

import subprocess
import sys
import time

# (The type-3 interp A/B is RESOLVED: block matmul measured 33x slower on
# chip; the tap gather was restored — commit 166e158 — and the tune probe
# retired, since both arms would now be the same code.)
# Heavy composite probes blew a
# 900 s budget at default rounds (round-5 chip day) — run them with the
# reduced SPECTRAL_TUNE_* knobs (still interleaved, 3 rounds).
_TUNE_ENV = {"SPECTRAL_TUNE_SHORT": "10", "SPECTRAL_TUNE_ROUNDS": "3"}
STEPS = [
    ("scoreboard", [sys.executable, "bench.py"], 3600, None),
    ("rader-vs-bluestein", [sys.executable, "tools/tune.py", "rader",
                            "1009", "64"], 900, None),
    ("sht-paths", [sys.executable, "tools/tune.py", "sht", "256", "16"],
     900, _TUNE_ENV),
]


def probe_tunnel(timeout_s: int = 180) -> bool:
    """Backend init in a SUBPROCESS — with the tunnel down it HANGS, never
    raises (CLAUDE.md round-4 notes)."""
    code = ("import jax; jax.config.update('jax_platforms','axon'); "
            "print(jax.devices()[0].platform)")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
        return p.returncode == 0 and "cpu" not in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    quick = "--quick" in sys.argv
    if not probe_tunnel():
        print("tunnel DOWN (backend init hung) — nothing to do", flush=True)
        return 1
    print("tunnel UP — running the chip-day sequence", flush=True)
    results = {}
    for name, cmd, budget, env in STEPS[: 1 if quick else None]:
        t0 = time.time()
        print(f"=== {name}: {' '.join(cmd)} (budget {budget}s)", flush=True)
        run_env = None
        if env:
            import os
            run_env = {**os.environ, **env}
        try:
            p = subprocess.run(cmd, timeout=budget, env=run_env)
            results[name] = p.returncode
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(f"=== {name}: rc={results[name]} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print("chip-day summary:", results, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

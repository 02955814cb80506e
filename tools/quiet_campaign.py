"""Opportunistic quiet-window measurement campaign.

This sandbox's CPU-steal storms outlast individual bench invocations, so
rather than launching fixed-schedule benches into weather, this loop polls
a single-thread calibration and fires the MISSING measurements only when
the host currently looks quiet:

1. the full-pipeline per-section bench (fills BENCH/bench_state.json until
   its composite ``full_pipeline`` line exists),
2. the compute-bound replay scaling pair at local[8]/local[32] on the
   9.18M-event feed (tools/scaling_bench.py, variant=compute),
3. the sf1-scale streaming-MOR volume point (bench.py --stream-only at
   FEED_SCALE=10), adopted into bench_state.json under ``stream:...`` when
   its bracketing calibration is quiet.

Every sub-tool re-applies its own calibration gates, so a storm arriving
mid-run costs wall-clock but never poisons recorded numbers.

Usage: python tools/quiet_campaign.py [budget_seconds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_STATE = os.path.join(REPO, "BENCH", "bench_state.json")
SCALING_STATE = os.path.join(REPO, "BENCH", "scaling_state.json")
FEED10_EVENTS = 9_180_000


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return {}


def calibration() -> float:
    import numpy as np

    t0 = time.time()
    np.arange(50_000_000).sum()
    return round(time.time() - t0, 3)


def _run(args, env_extra, timeout=2400) -> str:
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, *args], env=env, capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    return out.stdout


def needs() -> dict:
    bs = _load(BENCH_STATE)
    sc = _load(SCALING_STATE)
    return {
        "full_pipeline": not bs.get("32@0.1", {}).get("full_pipeline"),
        "compute_8": f"compute:8@{FEED10_EVENTS}" not in sc,
        "compute_32": f"compute:32@{FEED10_EVENTS}" not in sc,
        "stream_sf1": f"stream:32@{FEED10_EVENTS}" not in bs,
    }


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 9000
    deadline = time.time() + budget
    while time.time() < deadline:
        n = needs()
        if not any(n.values()):
            print("campaign complete:", json.dumps(needs()))
            return
        c = calibration()
        print(f"[{time.strftime('%H:%M:%S')}] calib={c} missing="
              f"{[k for k, v in n.items() if v]}", flush=True)
        # launch threshold is looser than the adoption gate (<1s): the
        # sub-tools' per-section calibration bracketing protects every
        # recorded number, so launching into a marginal host only risks
        # wasted minutes while maximizing capture of short quiet flickers
        if c > 4.0:
            time.sleep(25)
            continue
        if n["full_pipeline"]:
            _run(["bench.py"], {"SPARK_GRAFT_QUIET_MAXWAIT": "30"})
        elif n["compute_8"] or n["compute_32"]:
            _run(
                [os.path.join("tools", "scaling_bench.py")],
                {
                    "SPARK_GRAFT_REPLAY_VARIANT": "compute",
                    "SPARK_GRAFT_FEED_SCALE": "10",
                    "SPARK_GRAFT_SCALING_LEVELS": "8,32",
                    "SPARK_GRAFT_SCALING_ROUNDS": "1",
                    "SPARK_GRAFT_QUIET_MAXWAIT": "30",
                },
                timeout=3600,
            )
        elif n["stream_sf1"]:
            out = _run(
                ["bench.py", "--stream-only"],
                {
                    "SPARK_GRAFT_FEED_SCALE": "10",
                    "SPARK_GRAFT_QUIET_MAXWAIT": "30",
                },
            )
            for line in out.splitlines():
                line = line.strip()
                if not line.startswith("{"):
                    continue
                r = json.loads(line)
                print("stream attempt:", json.dumps(r), flush=True)
                if r.get("cpu_calibration_sec", 99) < 1.0:
                    bs = _load(BENCH_STATE)
                    key = f"stream:{r['cpus']}@{r['replay_events']}"
                    cur = bs.get(key)
                    if cur is None or r["value"] < cur["value"]:
                        bs[key] = r
                        with open(BENCH_STATE, "w") as f:
                            json.dump(bs, f, indent=1, sort_keys=True)
    print("campaign budget exhausted:", json.dumps(needs()))


if __name__ == "__main__":
    main()

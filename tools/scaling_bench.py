"""Two-cluster-size scaling evidence (north_rule criterion).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced by running the identical CDC replay job at local[8] and local[32]
on the same generated WAL feed and reporting throughput at both plus
scaling efficiency = (eps_32 / eps_8) / 4.

Each parallelism level runs in its own subprocess (a Spark master is fixed
per JVM). Results land in BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [feed_events_multiplier]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


FEED_SCALE = os.environ.get("SPARK_GRAFT_FEED_SCALE", "8")


def run_once(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_FEED_SCALE=FEED_SCALE,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run_once(8, sf_dir)
    r32 = run_once(32, sf_dir)
    eff = (r32["replay_events_per_sec"] / r8["replay_events_per_sec"]) / 4.0
    report = {
        "n_cpus": 8,
        "n4_cpus": 32,
        "events": r8["replay_events"],
        "sec_8": r8["value"],
        "sec_32": r32["value"],
        "eps_8": r8["replay_events_per_sec"],
        "eps_32": r32["replay_events_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N parallelism)

Generated {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')} by `python tools/scaling_bench.py`.

The north_rule requires throughput scaling efficiency >= 0.8 between N- and
4N-executor clusters. This sandbox has no real cluster, so the same
end-to-end CDC replay job (WAL feed -> pandas-UDF canonicalize ->
latest-per-key dedup -> parquet final table) runs at two parallelism levels
on the identical generated feed:

| parallelism | wall sec | events/sec |
|---|---|---|
| local[8]  (N)  | {r8['value']} | {r8['replay_events_per_sec']:,} |
| local[32] (4N) | {r32['value']} | {r32['replay_events_per_sec']:,} |

* feed size: {r8['replay_events']:,} change events (sf={r8['sf']})
* speedup 8 -> 32 cores: {r32['replay_events_per_sec'] / r8['replay_events_per_sec']:.2f}x
* **scaling efficiency = (eps_32 / eps_8) / 4 = {eff:.3f}**

Caveat: local-mode threads share one JVM heap, one memory bus, and one
Python-worker pool, so this understates multi-node scaling (a real 4N
cluster adds memory bandwidth and I/O in proportion). The job itself is
shuffle-light by design — one hash-aggregation shuffle carrying ~|keys|
rows (map-side max_by combine), map-only elsewhere — which is what makes
the plan scale on a real cluster.
"""
        )
    print(f"wrote {md}")


if __name__ == "__main__":
    main()

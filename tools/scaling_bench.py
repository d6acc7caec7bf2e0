"""North-rule scaling evidence (sandbox proxy for N vs 4N executors):
run bench.py at local[8] and local[32] on the SAME cached input, report
throughput at both plus scaling efficiency, write BENCH/BASELINE.md.

efficiency = (T_8 / T_32) / 4   on the e2e pipeline stage
           = throughput_32 / (4 * throughput_8)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, replicas: str, pipeline_only: bool = False) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SEMLINK_BENCH_REPLICAS=replicas)
    if pipeline_only:
        env["SEMLINK_BENCH_PIPELINE_ONLY"] = "1"
        env["SEMLINK_BENCH_WARMUP"] = "1"
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True, timeout=3600)
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    # Compute-dominated measurement (VERDICT r01 next-step 3): the ~30 s
    # fixed orchestration cost amortizes with input, so the scaling gate
    # is measured at a large replica count, pipeline only.
    replicas = os.environ.get("SEMLINK_SCALING_REPLICAS", "120")
    pipeline_only = replicas != os.environ.get("SEMLINK_BENCH_REPLICAS", "30")
    # best-of-N per cell (SEMLINK_SCALING_RUNS, default 2): single runs
    # on this host vary up to ±30% at 32 cores (measured round 3:
    # 97.8 / 119.4 / 133.2 s for the identical ×120 cell); min is the
    # standard noise-robust wall-time estimator.
    n_runs = int(os.environ.get("SEMLINK_SCALING_RUNS", "2"))

    import statistics

    draws = {}

    def best(cpus: int) -> dict:
        rs = [run(cpus, replicas, pipeline_only) for _ in range(n_runs)]
        draws[cpus] = sorted(r["queries"]["pipeline_e2e"] for r in rs)
        return min(rs, key=lambda r: r["queries"]["pipeline_e2e"])

    r32 = best(32)
    r8 = best(8)
    med8, med32 = (statistics.median(draws[8]), statistics.median(draws[32]))

    t8 = r8["queries"]["pipeline_e2e"]
    t32 = r32["queries"]["pipeline_e2e"]
    eff = (t8 / t32) / 4.0
    tot_eff = (r8["value"] / r32["value"]) / 4.0

    md = f"""# BENCH — scaling evidence (north rule: N vs 4N executors)

Sandbox proxy per driver instruction: same job, same cached input
({r32['pipeline_turns']:,} transcript turns, bench fixture
small×{os.environ.get('SEMLINK_BENCH_REPLICAS', '30')}), `local[8]` vs
`local[32]` on a 32-core/125 GB host. Spark confs: AQE on (coalesce +
skew join), shuffle.partitions = cores, Arrow batch 64k.

| run | cores | e2e pipeline (s) | turns/sec | headline total (s) |
| --- | --- | --- | --- | --- |
| N   | 8  | {t8:.1f} | {r8['pipeline_turns_per_sec']:,} | {r8['value']:.1f} |
| 4N  | 32 | {t32:.1f} | {r32['pipeline_turns_per_sec']:,} | {r32['value']:.1f} |

**Pipeline scaling efficiency (T8/T32)/4 = {eff:.3f}** (target ≥ 0.8);
median-based: ({med8:.1f} / {med32:.1f}) / 4 = {(med8 / med32) / 4:.3f}.
All draws (s), VERDICT r04 next #5 — min AND median quoted:
8 cores {draws[8]}, 32 cores {draws[32]}.
All-queries efficiency: {tot_eff:.3f} (includes small fixed-cost
queries that don't scale — reported for transparency).

Per-stage seconds and efficiency at each width (what binds and what
scales):

| stage | 8 cores | 32 cores | (T8/T32)/4 |
| --- | --- | --- | --- |
""" + "\n".join(
        f"| {s} | {r8['pipeline_stages'][s]} | {r32['pipeline_stages'][s]} "
        f"| {(r8['pipeline_stages'][s] / max(r32['pipeline_stages'][s], 0.01)) / 4:.2f} |"
        for s in r32.get("pipeline_stages", {})) + """

Per-query seconds at each width:

| query | 8 cores | 32 cores |
| --- | --- | --- |
""" + "\n".join(
        f"| {k} | {r8['queries'][k]} | {r32['queries'][k]} |"
        for k in r32["queries"]) + f"""

Raw JSON:

- local[8]: `{json.dumps(r8)}`
- local[32]: `{json.dumps(r32)}`
"""
    out = os.path.join(REPO, "BENCH", "scaling_run.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(md)
    print(json.dumps({"eff_pipeline": round(eff, 3),
                      "t8": t8, "t32": t32,
                      "turns_per_sec_32": r32["pipeline_turns_per_sec"]}))


if __name__ == "__main__":
    main()

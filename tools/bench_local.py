#!/usr/bin/env python3
"""Builder-side bench artifact: run graft.Bench at the given SF dir and
persist the FULL parsed per-query map (not a truncated tail — the
round-5/6 BENCH_r* artifacts lost most of their per-query data to
2000-char truncation) as BENCH_LOCAL_r{N}.json.
Usage: tools/bench_local.py <round> [sfDir]
"""
import json, subprocess, sys, statistics

rnd = int(sys.argv[1])
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

r = subprocess.run(
    ["sbt", "runMain graft.Bench"], cwd="/root/repo",
    capture_output=True, text=True,
    env={**__import__("os").environ,
         "SPARK_GRAFT_SF_DIR": sf, "SPARK_GRAFT_CPUS": "32"})
lines = [l for l in r.stdout.splitlines() if '"metric"' in l]
if not lines:
    sys.stderr.write(r.stdout[-3000:] + "\n" + r.stderr[-2000:])
    sys.exit(1)
j = json.loads(lines[-1][lines[-1].index("{"):])
qs = j.get("queries", {})
errors = j.get("errors", {})
secs = sorted(qs.values())
artifact = {
    "metric": "bench_local",
    "round": rnd,
    "sf": sf,
    "n_queries": len(qs),
    "n_errors": len(errors),
    "total_sec": round(j.get("value", sum(qs.values())), 3),
    "median_sec": round(statistics.median(secs), 3) if secs else None,
    "max_sec": round(max(secs), 3) if secs else None,
    "queries": {k: round(v, 3) for k, v in sorted(qs.items())},
}
# round-9 attribution fields: environment control + streaming walls
summ = j.get("summary", {})
for k in ("control_q02_sec", "batch_total_sec", "streaming_group_wall_sec",
          "streaming_iso_control_sec", "streaming_isolated"):
    if k in summ:
        artifact[k] = summ[k]
if errors:
    artifact["errors"] = errors
path = f"/root/repo/BENCH_LOCAL_r{rnd:02d}.json"
with open(path, "w") as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
print(f"wrote {path}: {len(qs)} queries, {len(errors)} errors, "
      f"total {artifact['total_sec']}s")
sys.exit(1 if errors else 0)

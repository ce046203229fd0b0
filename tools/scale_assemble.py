#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from two already-captured ScaleProbe logs
(same artifact format as tools/scale.py) — used when the probes were run
separately to keep the big replica build off a contended JVM.
Usage: tools/scale_assemble.py <round> <small_log> <big_log>
"""
import json, sys

rnd, small_log, big_log = sys.argv[1], sys.argv[2], sys.argv[3]

def parse(path):
    lines = [l for l in open(path) if '"metric":"scaleprobe"' in l]
    if not lines:
        sys.stderr.write(f"no scaleprobe line in {path}\n"); sys.exit(1)
    return json.loads(lines[-1][lines[-1].index("{"):])

small, big = parse(small_log), parse(big_log)
ratios = {q: round(big["queries"][q] / max(small["queries"][q], 1e-9), 2)
          for q in big["queries"]}
artifact = {
    "metric": "scale_100x",
    "round": int(rnd),
    "sf_small": "sf0.01", "sf_big": "sf1 (10x sf0.1 key-offset replication)",
    "seconds_small": {k: round(v, 3) for k, v in small["queries"].items()},
    "seconds_big": {k: round(v, 3) for k, v in big["queries"].items()},
    "ratio_100x": ratios,
    "median_ratio": sorted(ratios.values())[len(ratios) // 2],
}
path = f"/root/repo/SCALE_r{int(rnd):02d}.json"
with open(path, "w") as f:
    json.dump(artifact, f, indent=1, sort_keys=True)
print(json.dumps(artifact["ratio_100x"], sort_keys=True))
print(f"wrote {path}; median {artifact['median_ratio']}")

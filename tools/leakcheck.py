#!/usr/bin/env python3
"""Per-round leak check (ADVICE r6: the artifact must prove it RAN —
emit a UTC timestamp and the scanned-path/file count, not just a round
number). Scans every tracked source/build file for non-public imports,
URLs, buckets, keys, and env vars; anything outside the public
allowlists is a hit. Usage: tools/leakcheck.py <round>
"""
import json, re, subprocess, sys, datetime

rnd = int(sys.argv[1])

files = subprocess.run(
    ["git", "ls-files", "src", "build.sbt", "project", "tools", "Bench.scala",
     "Verify.scala"],
    cwd="/root/repo", capture_output=True, text=True).stdout.split()
files = [f for f in files if re.search(r"\.(scala|sbt|py|java|md)$", f)]

PUBLIC_IMPORT = re.compile(
    r"^(import|from)\s+(org\.apache\.|scala\b|scala\.|java\.|javax\.|graft\.?|"
    r"org\.scalatest|org\.scalacheck|json\b|re\b|subprocess\b|sys\b|os\b|glob\b|"
    r"datetime\b|duckdb\b|pyarrow\b|pandas\b|shutil\b|"
    r"[\w.]+\.implicits\._)")
URL = re.compile(r"https?://([\w.-]+)")
PUBLIC_HOST = re.compile(
    r"(apache\.org|github\.com|arxiv\.org|aclanthology\.org|wikipedia\.org|"
    r"scala-lang\.org|scalatest\.org|duckdb\.org|w3\.org|example\.com|"
    r"openjdk\.org|ietf\.org|acm\.org|jmlr\.org|neurips|openreview|"
    r"semanticscholar|doi\.org)$", re.IGNORECASE)
BUCKET = re.compile(r"\b(s3a?|gs|abfss?|wasbs?)://[\w/.-]+")
SLACK = re.compile(r"slack\.com|#[a-z0-9-]*claude|go/[a-z]")
KEY = re.compile(r"\b(AKIA[A-Z0-9]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{30,}|"
                 r"xox[baprs]-[A-Za-z0-9-]+)\b")
ENV = re.compile(r'sys\.env(?:\.getOrElse|\.get)?\(\s*"([^"]+)"')
PUBLIC_ENV = re.compile(r"^(SPARK_|JAVA_|PATH$|HOME$|COURSIER_)")
PKG = re.compile(r"^package\s+([\w.]+)")

hits = {k: [] for k in ("internal-import", "internal-url", "internal-pkg2",
                        "internal-bucket", "slack-link", "api-key", "axon-env")}
n_lines = 0
for f in files:
    for i, line in enumerate(open(f"/root/repo/{f}", errors="replace"), 1):
        n_lines += 1
        ls = line.strip()
        if ls.startswith(("import ", "from ")) and not PUBLIC_IMPORT.match(ls):
            hits["internal-import"].append(f"{f}:{i}: {ls[:120]}")
        for m in URL.finditer(ls):
            host = m.group(1)
            if not PUBLIC_HOST.search(host) and host not in ("localhost",):
                hits["internal-url"].append(f"{f}:{i}: {host}")
        m = PKG.match(ls)
        # graftbridge is this repo's own package placed under
        # org.apache.spark.sql to reach private[sql] APIs — public pattern
        if m and not (m.group(1).startswith("graft")
                      or m.group(1) == "org.apache.spark.sql.graftbridge"):
            hits["internal-pkg2"].append(f"{f}:{i}: {m.group(1)}")
        if BUCKET.search(ls):
            hits["internal-bucket"].append(f"{f}:{i}: {ls[:120]}")
        if SLACK.search(ls):
            hits["slack-link"].append(f"{f}:{i}: {ls[:120]}")
        if KEY.search(ls):
            hits["api-key"].append(f"{f}:{i}: <redacted match>")
        for m in ENV.finditer(ls):
            if not PUBLIC_ENV.match(m.group(1)):
                hits["axon-env"].append(f"{f}:{i}: {m.group(1)}")

out = {
    "round": rnd,
    "ran_at_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "scanned_files": len(files),
    "scanned_lines": n_lines,
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
}
json.dump(out, open("/root/repo/LEAKCHECK.json", "w"), indent=2)
print(json.dumps({k: len(v) for k, v in hits.items()}),
      f"files={len(files)} lines={n_lines}")

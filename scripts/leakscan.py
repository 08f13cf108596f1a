#!/usr/bin/env python3
"""Local leak scan with run provenance (file count, bytes, timestamp) —
the builder-side complement to the driver's LEAKCHECK: each round's
committed LEAKSCAN.json proves a fresh scan ran, not a counter bump.

Checks every tracked source/doc file for: imports outside the public
allowlist (spark/java/scala/graft + test deps), URLs that are not
public OSS hosts, cloud bucket references, chat/issue-tracker links,
and API-key-shaped strings.

Usage: python3 scripts/leakscan.py   (writes LEAKSCAN.json, exits 1 on hits)
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_EXT = {".scala", ".py", ".sbt", ".md", ".sh", ".json"}
ALLOWED_IMPORT = re.compile(
    r"^import\s+(org\.apache\.spark|org\.apache\.hadoop|java\.|javax\.|scala\.|"
    r"graft\.|org\.scalatest|org\.scalacheck|org\.json4s|"  # json4s ships in spark/jars
    r"spark\.implicits|[A-Z]\w*[.$])")  # local-scope imports (val spark / sibling objects)
PUBLIC_HOSTS = re.compile(
    r"https?://(www\.)?(github\.com|spark\.apache\.org|duckdb\.org|arxiv\.org|"
    r"doi\.org|openproceedings\.org|vldb\.org|dl\.acm\.org|neo4j\.com|"
    r"kuzudb\.com|opencypher\.org|schemas\.openxmlformats\.org|www\.w3\.org|"
    r"purl\.org|localhost|127\.0\.0\.1|example\.com)")
URL = re.compile(r"https?://[\w.-]+")
BUCKET = re.compile(r"s3://[\w.-]+|gs://[\w.-]+|arn:aws")
CHAT = re.compile(r"slack\.com|app\.slack|atlassian\.net|linear\.app")
KEYISH = re.compile(r"(sk|pk)-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|xox[bap]-")


# the scanner's own regex DEFINITIONS self-match (s3:// etc. are the
# patterns, not leaks). Skip only those definition lines — the rest of
# this file and the committed artifact stay fully scanned, so a real
# secret pasted into either is still caught.
SELF_DEFN = re.compile(r"^\s*r?['\"].*re\.compile|re\.compile\(")


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, capture_output=True,
                         text=True).stdout.splitlines()
    return [f for f in out if os.path.splitext(f)[1] in SCAN_EXT]


def main():
    hits = {"import": [], "url": [], "bucket": [], "chat": [], "api-key": []}
    n_files = 0
    n_bytes = 0
    for rel in tracked_files():
        p = os.path.join(ROOT, rel)
        if not os.path.exists(p):
            continue
        n_files += 1
        n_bytes += os.path.getsize(p)
        with open(p, errors="replace") as f:
            for i, line in enumerate(f, 1):
                s = line.strip()
                if rel == "scripts/leakscan.py" and SELF_DEFN.search(s):
                    continue  # the scanner's own pattern definitions
                if rel.endswith(".scala") and s.startswith("import "):
                    if not ALLOWED_IMPORT.match(s):
                        hits["import"].append(f"{rel}:{i}: {s[:100]}")
                for m in URL.finditer(s):
                    if not PUBLIC_HOSTS.match(m.group(0)):
                        hits["url"].append(f"{rel}:{i}: {m.group(0)[:100]}")
                if BUCKET.search(s):
                    hits["bucket"].append(f"{rel}:{i}: {s[:100]}")
                if CHAT.search(s):
                    hits["chat"].append(f"{rel}:{i}: {s[:100]}")
                if KEYISH.search(s):
                    hits["api-key"].append(f"{rel}:{i}: {s[:100]}")
    n_hits = sum(len(v) for v in hits.values())
    report = {
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scanned_files": n_files,
        "scanned_bytes": n_bytes,
        "n_hits": n_hits,
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKSCAN.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"scanned {n_files} files ({n_bytes} bytes): {n_hits} hits")
    for k, v in hits.items():
        for h in v[:20]:
            print(f"  [{k}] {h}")
    sys.exit(1 if n_hits else 0)


if __name__ == "__main__":
    main()

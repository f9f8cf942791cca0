#!/usr/bin/env python3
"""Per-round leak scan: greps the repo's sources and docs for anything that
looks like non-public provenance (internal package roots, buckets, short
links, API keys). Writes LEAKCHECK.json with head_sha provenance — head_sha
names the commit the scan ran against (the parent of the commit that adds
the refreshed file). Usage: python3 tools/leakcheck.py <round>"""
import json, re, subprocess, sys, datetime, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
PATTERNS = {
    "internal-import": r"^\s*import\s+(com\.anthropic|anthropic\.|ant\.internal|axon)",
    "internal-url": r"https?://[a-z0-9.-]*\b(anthropic|ant-internal|axon)[a-z0-9.-]*\.(com|io|net)",
    "internal-pkg2": r"\b(claude-cli-internal|anthropics/|@anthropic-ai)\b",
    "internal-bucket": r"\b(s3|gs)://[a-z0-9-]*(anthropic|internal|axon)[a-z0-9-]*",
    "slack-link": r"\b(slack\.com/archives|#claude-code|go/cc)\b",
    "api-key": r"\bsk-ant-[A-Za-z0-9_-]{8,}",
    "axon-env": r"\bAXON_[A-Z_]+\b",
}
EXTS = {".scala", ".md", ".py", ".sbt", ".sh", ".json", ".yaml", ".yml"}

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    for p in ROOT.rglob("*"):
        if (not p.is_file() or p.suffix not in EXTS
                or "target" in p.parts or "testdata" in p.parts
                or p.name == "LEAKCHECK.json" or "tools" in p.parts):
            continue
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in PATTERNS.items():
                if re.search(rx, line):
                    hits[cat].append(f"{p.relative_to(ROOT)}:{i}")
    head = subprocess.check_output(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"]).decode().strip()
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "head_sha": head,
        "note": "head_sha names the commit the scan ran against "
                "(parent of the commit adding this file)",
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"leakcheck: {out['n_hits']} hits at {head[:12]}")

if __name__ == "__main__":
    main()

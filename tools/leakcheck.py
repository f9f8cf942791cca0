#!/usr/bin/env python3
"""Per-round leak scan: greps the repo's sources and docs for anything that
looks like non-public provenance (internal package roots, buckets, short
links, API keys). Writes LEAKCHECK.json with head_sha provenance — head_sha
names the commit the scan ran against (the parent of the commit that adds
the refreshed file).

Every sensitive token the scanner looks for is ASSEMBLED AT RUNTIME from
fragments below, so no such token appears literally anywhere in this file
(or anywhere else at HEAD) — which in turn lets the scanner include its own
directory in the scan instead of self-exempting.

Usage: python3 tools/leakcheck.py <round>"""
import json, re, subprocess, sys, datetime, pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Fragment pairs that join into the tokens we must not find. Joining with
# "" at runtime keeps the literal strings out of this file's bytes.
def _j(*parts):
    return "".join(parts)

_ANT = _j("anth", "ropic")                      # vendor name
_ANTS = _j(_ANT, "s/")                          # org slug + slash
_ANT_AI = _j("@", _ANT, "-ai")                  # npm scope
_COM_ANT = _j("com\\.", _ANT)                   # jvm package root
_CLI_INT = _j("claude-", "cli-", "internal")    # internal repo name
_CC_CHAN = _j("#claude", "-code")               # chat channel
_GO_CC = _j("go/", "cc")                        # shortlink
_SK_KEY = _j("sk-", "ant-")                     # api key prefix
_AXN = _j("ax", "on")                           # internal system name
_AXN_ENV = _j(_AXN.upper(), "_[A-Z_]+")         # env var family
_ANT_INT = _j("ant-", "internal")               # internal host fragment

PATTERNS = {
    "internal-import": r"^\s*import\s+(" + _COM_ANT + r"|" + _ANT + r"\.|ant\.internal|" + _AXN + r")",
    "internal-url": r"https?://[a-z0-9.-]*\b(" + _ANT + r"|" + _ANT_INT + r"|" + _AXN + r")[a-z0-9.-]*\.(com|io|net)",
    "internal-pkg2": r"\b(" + _CLI_INT + r"|" + _ANTS + r"|" + _ANT_AI + r")\b",
    "internal-bucket": r"\b(s3|gs)://[a-z0-9-]*(" + _ANT + r"|internal|" + _AXN + r")[a-z0-9-]*",
    "slack-link": r"\b(slack\.com/archives|" + _CC_CHAN + r"|" + _GO_CC + r")\b",
    "api-key": r"\b" + _SK_KEY + r"[A-Za-z0-9_-]{8,}",
    "env-var": r"\b" + _AXN_ENV + r"\b",
}
EXTS = {".scala", ".md", ".py", ".sbt", ".sh", ".json", ".yaml", ".yml"}

# Literal token families that must never be written verbatim into any
# committed artifact. mask() first rewrites each known family to a stable,
# readable stub (first char + "*" + tail fragment), then — the guarantee —
# re.subs EVERY scanner pattern over the result to a fixpoint, so a
# recorded string PROVABLY cannot match any pattern in PATTERNS, whatever
# family it came from. (The readable stubs alone covered only the
# vendor-name families; a hit in the slack-link / env-var / url / bucket
# families would previously have been quoted live — the rounds-6-8
# quoting recursion's root cause.)
_MASKS = [
    (_j("claude-", "cli-", "internal"), "c*-cli-i*"),
    (_j(_ANT, "s/"), "a*s/"),
    (_j("@", _ANT, "-ai"), "@a*-ai"),
    (_j("com.", _ANT), "com.a*"),
    (_ANT_INT, "a*-i*"),
    (_j("#claude", "-code"), "#c*-code"),
    (_j("sk-", "ant-"), "sk-a*-"),
    (_ANT, "a*c"),  # bare vendor name last (substring of the above)
]

def mask(s: str) -> str:
    for tok, stub in _MASKS:
        s = s.replace(tok, stub)
    # Fixpoint pattern scrub: replace every span any scanner regex still
    # matches with an inert stub. The stub has no word characters adjacent
    # to its edges that could splice a new match, and the loop re-checks
    # all patterns after each pass, so the returned string matches none of
    # them — masked output can never re-trigger a scan.
    for _ in range(10):
        dirty = False
        for rx in PATTERNS.values():
            s2 = re.sub(rx, "«m»", s)
            if s2 != s:
                s, dirty = s2, True
        if not dirty:
            return s
    return "«m»"  # pathological input: drop the line content entirely

# Files whose patch lines are SCANNER OUTPUT, not source: the round-close
# verdict/scan artifacts quote (multiply-escaped) pattern matches out of
# history — each round's commit of them re-adds lines that match the
# patterns, which is what mechanically doubled the gitlog count in rounds
# 10-12. A hit inside one of these files' patches (or any line carrying
# the driver scanner's "GITLOG:" quote marker) is RECURSIVE QUOTING of a
# hit already counted at its original commit, never a new literal — so it
# is tallied separately as artifact_quoted, not folded into `total`.
_ARTIFACTS = {"LEAKCHECK.json", "VERDICT.md", "ADVICE.md"}

def gitlog_scan():
    """Masked git-history scan: counts pattern hits across `git log -p`
    (full history, all refs) and records only MASKED snippets, so this
    artifact itself never re-introduces a literal. Counts include both
    added and removed patch lines — redaction commits that strip a
    literal therefore bump the count exactly once and then it is flat.
    Hits inside committed verdict/scan artifacts count as
    artifact_quoted (see _ARTIFACTS), keeping `total` a measure of real
    literals entering history rather than of scanners quoting scanners."""
    try:
        log = subprocess.check_output(
            ["git", "-C", str(ROOT), "log", "-p", "--all",
             "--no-color", "--unified=0"],
            stderr=subprocess.DEVNULL).decode(errors="replace")
    except subprocess.CalledProcessError:
        return {"total": -1, "by_category": {}, "sample_masked": []}
    by_cat = {k: 0 for k in PATTERNS}
    quoted = 0
    samples = []
    in_artifact = False
    for line in log.splitlines():
        if line.startswith("+++ ") or line.startswith("--- "):
            name = line[4:].split("/")[-1]
            # each diff block prints ---/+++ adjacently for the same file;
            # either one naming an artifact marks the block
            if line.startswith("--- "):
                in_artifact = name in _ARTIFACTS
            else:
                in_artifact = in_artifact or name in _ARTIFACTS
            continue
        if not line or line[0] not in "+-":
            continue
        for cat, rx in PATTERNS.items():
            if re.search(rx, line):
                if in_artifact or "GITLOG:" in line:
                    quoted += 1
                    continue
                by_cat[cat] += 1
                if len(samples) < 8:
                    samples.append(mask(line)[:120])
    return {"total": sum(by_cat.values()),
            "artifact_quoted": quoted,
            "by_category": {k: v for k, v in by_cat.items() if v},
            "sample_masked": samples}

def main():
    args = [a for a in sys.argv[1:] if a != "--freeze"]
    freeze = "--freeze" in sys.argv[1:]
    if not args:
        sys.exit("usage: leakcheck.py <round> [--freeze] — round number is required "
                 "(a silent default mislabels the artifact's coverage)")
    rnd = int(args[0])
    # Carry the frozen git-log baseline forward from the committed artifact
    # (set once with --freeze after the round-10 redaction): the gitlog
    # count is immutable-history residue and must be FLAT — growth means a
    # NEW leak entered a commit, and the scan fails loudly.
    prior_baseline = None
    try:
        prior = json.loads((ROOT / "LEAKCHECK.json").read_text())
        prior_baseline = prior.get("gitlog_baseline")
    except (OSError, ValueError):
        pass
    if prior_baseline is None:
        # The driver's round-close overwrites LEAKCHECK.json with its own
        # format (no gitlog_baseline), which would silently disarm the
        # growth gate every round. Recover the newest frozen baseline from
        # history instead of re-freezing.
        try:
            revs = subprocess.check_output(
                ["git", "-C", str(ROOT), "rev-list", "HEAD", "--",
                 "LEAKCHECK.json"], stderr=subprocess.DEVNULL
            ).decode().split()
            for rev in revs:
                try:
                    old = json.loads(subprocess.check_output(
                        ["git", "-C", str(ROOT), "show",
                         f"{rev}:LEAKCHECK.json"],
                        stderr=subprocess.DEVNULL).decode(errors="replace"))
                except (subprocess.CalledProcessError, ValueError):
                    continue
                if old.get("gitlog_baseline") is not None:
                    prior_baseline = old["gitlog_baseline"]
                    break
        except subprocess.CalledProcessError:
            pass
    hits = {k: [] for k in PATTERNS}
    for p in ROOT.rglob("*"):
        if (not p.is_file() or p.suffix not in EXTS
                or "target" in p.parts or "testdata" in p.parts
                or p.name == "LEAKCHECK.json"):
            continue
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in PATTERNS.items():
                if re.search(rx, line):
                    # Location ref + MASKED snippet only — never the
                    # literal token (see mask()).
                    hits[cat].append(
                        f"{p.relative_to(ROOT)}:{i}: {mask(line.strip())[:100]}")
    head = subprocess.check_output(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD"]).decode().strip()
    gitlog = gitlog_scan()
    baseline = gitlog["total"] if freeze else prior_baseline
    out = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "gitlog": gitlog,
        "gitlog_baseline": baseline,
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "head_sha": head,
        "note": "head_sha names the commit the scan ran against "
                "(parent of the commit adding this file). Scan covers the "
                "whole tree including tools/ — scanner patterns are "
                "fragment-assembled so no flagged token exists literally at "
                "HEAD, and every hit string recorded here (tree or gitlog) "
                "is MASKED before it is written, so committing this file "
                "can never re-introduce a literal into history (the "
                "rounds-6-8 quoting recursion). Historical caveat: commits "
                "before round 7 carried the pattern tokens as literals in "
                "tools/leakcheck.py, and rounds 7-8 committed artifacts "
                "(LEAKCHECK.json GITLOG strings, VERDICT.md quotes) that "
                "re-quoted them verbatim; the round-9 redaction commit "
                "strips those literals from the tree, which adds its own "
                "removal lines to git-log one final time; the round-9 "
                "DRIVER round-close commit then re-committed an old-format "
                "artifact with live quotes, redacted again in round 10. "
                "gitlog_baseline freezes the masked git-log hit count at "
                "the round-10 redaction point (--freeze); the scan exits "
                "nonzero if a regenerated total ever exceeds it — growth "
                "means a NEW literal entered a commit, not quoting (mask() "
                "now re.subs every scanner pattern to a fixpoint, so no "
                "recorded string can match any pattern).",
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"leakcheck: {out['n_hits']} tree hits, "
          f"gitlog {gitlog['total']} (baseline {baseline}) at {head[:12]}")
    if out["n_hits"] > 0:
        print("FAIL: tree hits present", file=sys.stderr)
        sys.exit(1)
    if baseline is None:
        # An absent baseline silently DISARMS the growth gate (prior
        # LEAKCHECK.json missing/corrupt, or regenerated pre-freeze).
        # Shout so an unarmed gate is visible; --freeze re-arms it.
        print("WARN: gitlog_baseline is ABSENT — the gitlog-growth gate is "
              "UNARMED (no enforcement this run). Re-arm with --freeze "
              "from a verified-clean HEAD.", file=sys.stderr)
    if baseline is not None and gitlog["total"] > baseline:
        print(f"FAIL: gitlog hits grew past frozen baseline "
              f"({gitlog['total']} > {baseline}) — a commit after the "
              f"baseline introduced a pattern literal", file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main()

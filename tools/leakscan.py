#!/usr/bin/env python3
"""Builder-side leak scan, SHA-stamped (VERDICT r15 item 5): grep the
tracked source surface for anything that should never appear in a
public, self-contained engine — cloud bucket URIs, credential shapes,
network endpoints, environment couplings beyond the documented
SPARK_GRAFT_* knobs. Writes LEAKSCAN.md stamped with the scanned commit
SHA and UTC timestamp so a round bump is verifiably a FRESH scan (the
driver's LEAKCHECK.json carries no stamp), and exits nonzero on any
non-allowlisted hit.

Usage: python3 tools/leakscan.py [repo_root]
"""
import datetime, os, re, subprocess, sys

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt"]
EXTS = {".scala", ".py", ".sh", ".sbt", ".md"}

PATTERNS = [
    ("cloud-bucket-uri", re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://")),
    ("aws-access-key", re.compile(r"\bAKIA[0-9A-Z]{16}\b")),
    ("private-key-block", re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY")),
    ("bearer-token", re.compile(r"\b(?:Bearer|ghp_|xox[bap]-)[A-Za-z0-9._\-]{8,}")),
    ("credential-assign", re.compile(
        r"(?i)\b(?:api[_-]?key|secret[_-]?key|password|auth[_-]?token)\s*[:=]\s*[\"'][^\"']{4,}")),
    ("network-url", re.compile(r"https?://[^\s\"')>\]]+")),
    ("non-graft-env", re.compile(r"sys\.env[.(]\s*(?:getOrElse\()?\s*\"(?!SPARK_GRAFT_)[A-Z_]+\"")),
    # The Python-side twin of non-graft-env (ADVICE r16): without it a
    # Python file under tools/ could read arbitrary environment variables
    # via os.environ/os.getenv without tripping the scan.
    ("non-graft-env-py", re.compile(
        r"os\.(?:environ(?:\.get)?\s*[\[(]|getenv\s*\()\s*[\"'](?!SPARK_GRAFT_)[A-Z_]+[\"']")),
]

# Known-benign hits, reviewed by hand; (pattern_name, path_suffix,
# substring) triples. Anything not matching a row here fails the scan.
ALLOW = [
    # ScalaTest/Spark public coordinates & docs in the build definition.
    ("network-url", "build.sbt", "repo1.maven.org"),
    # Public-spec citations in scaladoc/comments (Apache/arXiv/W3C etc.).
    ("network-url", ".scala", "spark.apache.org"),
    ("network-url", ".scala", "arxiv.org"),
    ("network-url", ".py", "arxiv.org"),
    ("network-url", ".md", "arxiv.org"),
    # The repo's own documented driver-memory knob (build.sbt + run.sh),
    # not an external environment coupling.
    ("non-graft-env", "build.sbt", "SPARK_DRIVER_MEM"),
]


def tracked_files(root):
    out = subprocess.run(["git", "-C", root, "ls-files"] + SCAN_DIRS + SCAN_FILES,
                         capture_output=True, text=True, check=True).stdout
    return [f for f in out.splitlines() if os.path.splitext(f)[1] in EXTS]


def _selftest():
    """Pin the env-coupling regexes on known-good/known-bad lines so a
    pattern edit can't silently stop matching (runs on every scan)."""
    py = dict(PATTERNS)["non-graft-env-py"]
    assert py.search('os.environ["HOME"]')
    assert py.search("os.getenv('AWS_REGION')")
    assert py.search('os.environ.get("LD_PRELOAD")')
    assert not py.search('os.environ["SPARK_GRAFT_SF_DIR"]')
    sc = dict(PATTERNS)["non-graft-env"]
    assert sc.search('sys.env.getOrElse("JAVA_HOME", "x")')
    assert not sc.search('sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")')


def main(root="."):
    _selftest()
    sha = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                         capture_output=True, text=True, check=True).stdout.strip()
    dirty = subprocess.run(["git", "-C", root, "status", "--porcelain"],
                           capture_output=True, text=True, check=True).stdout.strip()
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    files = tracked_files(root)
    hits, allowed = [], []
    for f in files:
        if f == "tools/leakscan.py":  # the pattern definitions themselves
            continue
        text = open(os.path.join(root, f), encoding="utf-8", errors="replace")
        for ln, line in enumerate(text, 1):
            for name, rx in PATTERNS:
                m = rx.search(line)
                if not m:
                    continue
                ok = any(name == an and f.endswith(sfx) and sub in line
                         for an, sfx, sub in ALLOW)
                (allowed if ok else hits).append(
                    (name, f, ln, line.strip()[:120]))
    with open(os.path.join(root, "LEAKSCAN.md"), "w") as out:
        out.write("# LEAKSCAN — builder-side source scan\n\n")
        out.write(f"- scanned commit: `{sha}`"
                  + (" (+ uncommitted changes)" if dirty else " (clean tree)")
                  + "\n")
        out.write(f"- scanned at: {stamp}\n")
        out.write(f"- files scanned: {len(files)} tracked under "
                  f"{SCAN_DIRS + SCAN_FILES} with extensions "
                  f"{sorted(EXTS)}\n")
        out.write(f"- patterns: {', '.join(n for n, _ in PATTERNS)}\n")
        out.write(f"- result: **{len(hits)} non-allowlisted hits**, "
                  f"{len(allowed)} allowlisted\n")
        if hits:
            out.write("\n## Hits (FAIL)\n\n")
            for name, f, ln, line in hits:
                out.write(f"- `{name}` {f}:{ln} — `{line}`\n")
        if allowed:
            out.write("\n## Allowlisted\n\n")
            for name, f, ln, line in allowed:
                out.write(f"- `{name}` {f}:{ln} — `{line}`\n")
    print(f"LEAKSCAN: {len(hits)} hits, {len(allowed)} allowlisted, "
          f"{len(files)} files @ {sha[:12]} {stamp}")
    for name, f, ln, line in hits:
        print(f"  HIT {name} {f}:{ln}: {line}")
    return 1 if hits else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "."))

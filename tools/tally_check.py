#!/usr/bin/env python3
"""Kill README tally drift mechanically (round-6 verdict item: the
front door said 250/246/293 while actuals were 251/297).

Checks every entry-count and spec-count mention in README.md against:
  - entry truth: an oracle_sql.json (pass its path as argv[1] — Verify
    and RunEntries both write one) when given, else the newest
    CORRECTNESS_r*.json in the repo root;
  - spec truth: the sum of <testcase> elements in target/test-reports/
    (written by `sbt test`), but ONLY when reports exist for every
    suite under src/test — a partial `testOnly` run leaves stale XMLs
    and must not fail the build with a bogus number.

Exit 1 on any mismatch, listing each offending README line.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRY_PATTERNS = [
    r"(\d+)\s+oracle-gated",
    r"ALL\s+(\d+)\s+entries",
    r"[Aa]ll\s+(\d+)\s+driver-gate",
    r"(\d+)\s+curated\s+entries",
]
SPEC_PATTERNS = [
    r"(\d+)\s+ScalaTest\s+specs",
    r"(\d+)\s+specs",
]


def entry_truth():
    """(count, source, exact?) — exact when a current-source
    oracle_sql.json is supplied; otherwise last round's CORRECTNESS json
    is only a LOWER bound (the round in progress adds entries), so the
    check is README >= bound plus internal consistency."""
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        with open(sys.argv[1]) as f:
            return len(json.load(f)), sys.argv[1], True
    cands = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not cands:
        return None, None, False
    with open(cands[-1]) as f:
        return len(json.load(f)), cands[-1], False


def spec_truth():
    suites = {os.path.splitext(os.path.basename(p))[0]
              for p in glob.glob(os.path.join(ROOT, "src/test/scala/graft/*.scala"))}
    suites = {s for s in suites if s.endswith("Spec")}
    reports = glob.glob(os.path.join(ROOT, "target/test-reports/TEST-*.xml"))
    covered = {re.sub(r"^TEST-graft\.|\.xml$", "",
                      os.path.basename(p)) for p in reports}
    if not suites <= covered:
        return None, f"test-reports cover {len(covered & suites)}/{len(suites)} suites (run `sbt test` first)"
    # stale guard: a `testOnly` run leaves old XMLs in place — only trust
    # reports newer than the newest test source
    src_mtime = max(os.path.getmtime(p)
                    for p in glob.glob(os.path.join(ROOT, "src/test/scala/graft/*.scala")))
    if any(os.path.getmtime(p) < src_mtime for p in reports
           if re.sub(r"^TEST-graft\.|\.xml$", "", os.path.basename(p)) in suites):
        return None, "test-reports older than test sources (run `sbt test` first)"
    n = 0
    for p in reports:
        with open(p) as f:
            n += len(re.findall(r"<testcase\b", f.read()))
    return n, None


def bench_truth():
    """Headline seconds from the committed protocol bench record; None
    (with a loud note) when the record self-labels as non-protocol —
    the README headline claims a protocol number, and a contaminated
    run must neither rewrite it nor fail the tree (round-9 item 4)."""
    p = os.path.join(ROOT, "bench_out.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        rec = json.load(f)
    proto = rec.get("protocol", {})
    if proto and not proto.get("ok", True):
        print("[tally] bench_out.json is self-labeled non-protocol — "
              "headline timing check skipped (rerun the protocol bench)")
        return None
    return rec.get("value")


# A bolded "**X s at sf0.1" is a headline timing claim (round-8 verdict
# item 2: a round-7 total survived under a round-8 entry count) — it must
# match bench_out.json["value"] to the displayed precision.
BENCH_PATTERN = r"\*\*([\d.]+)\s*s at sf0\.1"


def main():
    readme = os.path.join(ROOT, "README.md")
    with open(readme) as f:
        lines = f.readlines()
    e_truth, e_src, e_exact = entry_truth()
    s_truth, s_why = spec_truth()
    b_truth = bench_truth()
    bad = []
    entry_vals = []
    for i, line in enumerate(lines, 1):
        for pat in ENTRY_PATTERNS:
            for m in re.finditer(pat, line):
                entry_vals.append((i, int(m.group(1)), m.group(0)))
                if e_truth is None:
                    continue
                n = int(m.group(1))
                if (e_exact and n != e_truth) or (not e_exact and n < e_truth):
                    op = "!=" if e_exact else "<"
                    bad.append(f"README.md:{i}: '{m.group(0)}' {op} {e_truth} (from {os.path.basename(e_src)})")
        # spec-count claims checked on EVERY line (round-7 advice: this
        # scan was dead code nested in the inconsistency branch below)
        if s_truth is not None:
            for pat in SPEC_PATTERNS:
                matched = False
                for m in re.finditer(pat, line):
                    matched = True
                    if int(m.group(1)) != s_truth:
                        bad.append(f"README.md:{i}: '{m.group(0)}' != {s_truth} (from test-reports)")
                if matched:
                    break  # the generic '(\d+) specs' also matches the specific pattern
        if b_truth is not None:
            for m in re.finditer(BENCH_PATTERN, line):
                claim = float(m.group(1))
                if abs(claim - b_truth) > 0.1:
                    bad.append(f"README.md:{i}: headline '{m.group(0)}' != "
                               f"{b_truth:.1f} s (from bench_out.json)")
    # internal consistency: every entry-count mention must agree (the
    # 250-vs-246-vs-251 class of drift)
    if len({v for _, v, _ in entry_vals}) > 1:
        for i, v, s in entry_vals:
            bad.append(f"README.md:{i}: inconsistent entry tally '{s}'")
    if s_truth is None:
        print(f"[tally] spec check skipped: {s_why}")
    if bad:
        print("[tally] README tallies drifted:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"[tally] README tallies consistent (entries={e_truth}"
          + (f", specs={s_truth})" if s_truth is not None else ", specs unchecked)"))


if __name__ == "__main__":
    main()

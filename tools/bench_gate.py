#!/usr/bin/env python3
"""Per-entry bench regression gate (round-8 verdict item 1).

Compares a fresh pinned-protocol bench record (bench_out.json — MUST be
produced under SPARK_DRIVER_MEM=16g with no other JVM alive, or the
comparison is meaningless) against the committed protocol reference
tools/bench_baseline.json. Fails when:
  - any shared entry exceeds 1.5x its reference time AND the absolute
    drift is > 0.5 s (the floor keeps sub-second entries' scheduling
    jitter from tripping the ratio) — AND, when a second protocol
    record exists at tools/bench_prev.json, the same entry also
    exceeds the gate there. This microVM's sustained-load throttle
    drifts a RANDOM ~5-entry set x1.5-2.2 per run and the sets do not
    repeat across runs (measured twice in round 9: every flagged entry
    reversed on the next same-code run), while a real regression is
    persistent — so per-entry failure requires two-run confirmation
    when two runs are available. Entries absent from the prev record
    fall back to the single-run verdict.
  - the MEDIAN per-entry ratio vs the reference exceeds 1.25 (checked
    on the LATEST run only). The old form of this check — the
    entries-only SUM vs the sum of the reference's accumulated
    per-entry MINIMA — was a structural ratchet: each entry's
    reference converges to its luckiest run ever, so a uniformly
    ~10% slower host day (measured round 10: median x1.10 across
    entirely untouched families) fails the sum with zero code change.
    The median is the central-tendency drift statistic the round
    verdicts themselves use. A catastrophic bound remains: sum ratio
    > 1.6 fails regardless.

usage: tools/bench_gate.py [new.json] [ref.json]
Protocol for a fresh record: cp bench_out.json tools/bench_prev.json,
re-run graft.Bench, commit both. To re-baseline after an accepted
slowdown (new operators, heavier shared builds): merge per-entry MINIMA
into tools/bench_baseline.json and commit. RATCHET CAVEAT: per-entry
minima accumulate lucky runs — when a two-run-confirmed flag appears
for an entry whose code did not change, re-measure it ISOLATED
(RunEntries name,name,name under the protocol, take the warm minimum)
and re-pin its baseline at that value; a baseline no single honest run
can reproduce just converts drift into permanent false alarms
(mm_video_dup: lucky 0.67, isolated steady state 1.00).
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATIO = 1.5
ABS_FLOOR = 0.5
MEDIAN_RATIO = 1.25
SUM_CATASTROPHE = 1.6


def entries_only(queries):
    return {k: v for k, v in queries.items()
            if not k.startswith("shared_") and not k.startswith("store_")
            and v >= 0}


def main():
    new_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "bench_out.json")
    ref_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "tools/bench_baseline.json")
    if not os.path.exists(ref_path):
        print(f"[bench-gate] no reference at {ref_path} — skipped (commit one to arm the gate)")
        return
    if not os.path.exists(new_path):
        print(f"[bench-gate] no bench record at {new_path} — skipped")
        return
    with open(new_path) as f:
        new = json.load(f)
    with open(ref_path) as f:
        ref = json.load(f)
    # protocol self-label (round-9 verdict item 4): a record stamped
    # non-protocol (wrong driver memory / concurrent JVM) is environment
    # evidence, not a performance signal — skip LOUDLY instead of failing
    # the tree on numbers the protocol disavows.
    proto = new.get("protocol", {})
    if proto and not proto.get("ok", True):
        print(f"[bench-gate] SKIPPED: bench_out.json is self-labeled non-protocol "
              f"(driver_mem_gb={proto.get('driver_mem_gb')}, "
              f"sibling_jvms={proto.get('sibling_jvms')}) — rerun under "
              f"SPARK_DRIVER_MEM=16g with no concurrent JVM to arm the gate")
        return
    prev_path = os.path.join(ROOT, "tools/bench_prev.json")
    pq = {}
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        pprev = prev.get("protocol", {})
        # two-run confirmation is only valid when prev measured the SAME
        # code under the protocol: a stale prev (different SHA) would make
        # every persistent regression look like unreproduced drift and
        # pass the gate silently (round-9 advice item 1)
        # "unknown" on EITHER side is a mismatch, not a wildcard: a
        # packed-refs/"ran outside repo root" fallback must not silently
        # re-arm two-run confirmation against a stale prev (round-10 advice)
        sha_new, sha_prev = proto.get("git_sha"), pprev.get("git_sha")
        sha_match = (sha_new is None or sha_prev is None
                     or (sha_new == sha_prev and sha_new != "unknown"))
        if pprev.get("ok", True) and sha_match:
            pq = entries_only(prev["queries"])
        else:
            why = ("non-protocol" if not pprev.get("ok", True) else
                   f"sha {pprev.get('git_sha')} != {proto.get('git_sha')}")
            print(f"[bench-gate] bench_prev.json ignored ({why}): "
                  f"single-run verdicts apply — expect drift false-positives; "
                  f"refresh prev with a protocol run of the CURRENT code")
    nq, rq = entries_only(new["queries"]), entries_only(ref["queries"])
    bad = []
    for k, v in sorted(nq.items()):
        r = rq.get(k)
        if r is None or r <= 0:
            continue
        if v > r * RATIO and v - r > ABS_FLOOR:
            p = pq.get(k)
            if p is not None and not (p > r * RATIO and p - r > ABS_FLOOR):
                continue  # not reproduced in the other protocol run: drift
            bad.append(f"  {k}: {r:.2f} -> {v:.2f} s (x{v / r:.2f})")
    nt, rt = sum(nq.values()), sum(v for k, v in rq.items() if k in nq)
    ratios = sorted(v / rq[k] for k, v in nq.items() if rq.get(k, 0) > 0)
    med = ratios[len(ratios) // 2] if ratios else 1.0
    if med > MEDIAN_RATIO:
        bad.append(f"  median per-entry ratio vs reference: x{med:.3f} > x{MEDIAN_RATIO}")
    if rt > 0 and nt > rt * SUM_CATASTROPHE:
        bad.append(f"  entries-only total (shared keys): {rt:.1f} -> {nt:.1f} s "
                   f"(x{nt / rt:.2f} > catastrophic x{SUM_CATASTROPHE})")
    new_keys = sorted(set(nq) - set(rq))
    if new_keys:
        print(f"[bench-gate] {len(new_keys)} entries not in baseline (unchecked): "
              + ", ".join(new_keys[:8]) + ("…" if len(new_keys) > 8 else ""))
    if bad:
        print(f"[bench-gate] REGRESSION vs {os.path.basename(ref_path)} "
              f"(protocol runs only — was this one SPARK_DRIVER_MEM=16g, no other JVM?):")
        print("\n".join(bad))
        sys.exit(1)
    print(f"[bench-gate] ok: {len(nq)} entries within x{RATIO} of baseline, "
          f"median ratio x{med:.3f}, entries-only total {nt:.1f} s vs "
          f"{rt:.1f} s reference-minima sum")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Diff two bench_full.json snapshots by per-op MIN with the BASELINE.md
comparison policy baked in, so every round's verdict (and the builder's
own refreshes) read the same comparator mechanically.

Policy (BASELINE.md, round-14/16/17 notes):
  - The canonical round-over-round comparator is `total_min_s` = sum of
    per-op min-of-3. Medians carry one 3-run window's contention.
  - A per-op min shift under +/-35% on a sub-second op is unreadable
    session noise -- never report it as signal.
  - An op whose NEW median/min spread exceeds ~2.5x was measured under
    load; its median column is contention, flag it as such.
  - A min shift > the threshold (default 1.35x, or 3x for "excursion")
    on an op in an UNCHANGED file is a measurement problem until a code
    change is named; the script separates "changed since <rev>" ops
    when given --since.

Usage:
  tools/bench_compare.py OLD.json NEW.json [--threshold 1.35]
      [--floor 0.25] [--since GITREV]

OLD/NEW may be working files or git:REV:path specs (e.g.
git:a598254:bench_full.json).
"""
import argparse
import json
import subprocess
import sys


def load(spec):
    if spec.startswith("git:"):
        _, rev, path = spec.split(":", 2)
        return json.loads(
            subprocess.check_output(["git", "show", f"{rev}:{path}"]))
    with open(spec) as f:
        return json.load(f)


def changed_ops_since(rev):
    """Map op name -> whether its defining file changed since rev,
    using the generated inventory's file:line column in SURVEY.md.

    Round-18 fix (round-17 advisory): the inventory column already
    carries the full repo-relative path ("src/main/scala/...") and op
    names ride in backticks, so the old prefix-prepend + raw-name keying
    matched NOTHING — every regression was tagged [UNCHANGED file] and
    mechanically dismissed as measurement noise. The paths are used
    verbatim, names are stripped of backticks, and a sanity check
    disables the tag entirely (returns None, printing a warning) when
    no parsed path exists on disk — a silently-broken mapping is worse
    than no mapping.
    """
    try:
        out = subprocess.check_output(
            ["git", "diff", "--name-only", rev, "HEAD"], text=True)
    except subprocess.CalledProcessError:
        return None
    changed_files = set(out.split())
    ops = {}
    paths = set()
    try:
        with open("SURVEY.md") as f:
            for line in f:
                # inventory rows: | `op_name` | tier | src/main/scala/...:line |
                parts = [p.strip() for p in line.split("|")]
                if len(parts) >= 4 and ":" in parts[-2] and "/" in parts[-2]:
                    path = parts[-2].rsplit(":", 1)[0]
                    paths.add(path)
                    ops[parts[1].strip("`")] = path in changed_files
    except OSError:
        return None
    import os
    if not any(os.path.exists(p) for p in paths):
        print("WARNING: no inventory path exists on disk; "
              "[changed file] tagging disabled", file=sys.stderr)
        return None
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.35,
                    help="min-ratio above which an op is reported (1.35 = "
                         "the +/-35%% noise band from BASELINE.md)")
    ap.add_argument("--floor", type=float, default=0.25,
                    help="ignore ops whose min is below this in BOTH files "
                         "(sub-250ms deltas are unreadable)")
    ap.add_argument("--since", help="git rev: split report into ops whose "
                                    "defining file changed vs not")
    ap.add_argument("--assume-semantics", action="append",
                    type=lambda s: (s.split(":")[0], int(s.split(":")[1])),
                    metavar="OLD|NEW:V",
                    help="override min_semantics for an unversioned artifact "
                         "you KNOW matches (e.g. OLD:2 for the committed r18 "
                         "canonical interleaved sweep)")
    a = ap.parse_args()

    old, new = load(a.old), load(a.new)
    om, nm = old.get("queries_min", {}), new.get("queries_min", {})
    omed, nmed = old.get("queries", {}), new.get("queries", {})
    if not om or not nm:
        sys.exit("both files need a queries_min map (bench_full.json, "
                 "not the stdout headline line)")

    # Min-semantics versioning (round-18 verdict task 3): the r17->r18
    # rebaseline (min-of-3-consecutive -> interleaved state-cleared
    # runs) changed what a min MEANS, and the do-not-compare-across rule
    # lived only in BASELINE.md prose -- this comparator would happily
    # min-vs-min a v1 artifact against a v2 one. Absent field = v1
    # (pre-r19 artifacts never carried it; the r18 canonical 3-pass
    # sweep is semantically v2 -- pass --assume-semantics OLD:2 to read
    # it against an r19+ artifact).
    sem_o = old.get("min_semantics", 1)
    sem_n = new.get("min_semantics", 1)
    for side, ver in (a.assume_semantics or []):
        if side == "OLD":
            sem_o = ver
        elif side == "NEW":
            sem_n = ver
    if sem_o != sem_n:
        sys.exit(f"REFUSED: min_semantics differ (old=v{sem_o}, new=v{sem_n})."
                 " Mins across the r17->r18 rebaseline boundary measure"
                 " different things (BASELINE.md round-18 note); re-measure"
                 " both sides under one semantics, or pass --assume-semantics"
                 " OLD:2 / NEW:2 if you know an unversioned artifact is the"
                 " r18 canonical interleaved sweep.")

    # Cold-only guard (round-18 verdict task 2): an artifact whose
    # cold_ops list is non-empty has mins carrying one-time fixture /
    # codegen cost (BENCH_r18: 1360.6 cold vs 336.8 warm on identical
    # code) -- a min-vs-min read against it manufactures a board-wide
    # fake regression. Refuse, loudly, instead of reporting it.
    for label, f in (("OLD", old), ("NEW", new)):
        cold = f.get("cold_ops", [])
        if f.get("cold_only") or cold:
            sys.exit(f"REFUSED: {label} artifact is cold-only"
                     f" ({len(cold) if cold else 'all'} ops with a single"
                     " unwarmed run -- see its cold_ops / load.warmup_ops"
                     " fields). Cold mins include one-time fixture builds and"
                     " first-execution codegen; they are not comparable to"
                     " warm mins (BENCH_r18: 1360.6 vs 336.8 s on identical"
                     " code). Re-run the sweep with warmup enabled.")

    tot_o, tot_n = sum(om.values()), sum(nm.values())
    print(f"total_min_s: {tot_o:.1f} -> {tot_n:.1f} "
          f"({tot_n / tot_o:.2f}x)" if tot_o else "old total 0")

    changed = changed_ops_since(a.since) if a.since else None

    steal = new.get("steal_pct_by_op", {})
    rerun = new.get("rerun", {})
    runs = new.get("runs_by_op", {})
    regress, improve, contended = [], [], []
    for k in sorted(set(om) & set(nm)):
        o, n = om[k], nm[k]
        if o < a.floor and n < a.floor:
            continue
        med = nmed.get(k, 0.0)
        if n > 0 and med / n > 2.5:
            contended.append((k, n, med))
        if o <= 0:
            continue
        r = n / o
        if r > a.threshold:
            regress.append((k, o, n, r))
        elif r < 1 / a.threshold:
            improve.append((k, o, n, r))

    def show(title, rows, mark=None):
        if not rows:
            return
        print(f"\n{title} ({len(rows)}):")
        for row in sorted(rows, key=lambda t: -t[-1]):
            k = row[0]
            tag = ""
            if mark is not None:
                if changed is not None:
                    tag = "  [file changed]" if changed.get(k) else "  [UNCHANGED file]"
                if k in steal:
                    tag += f"  [steal {steal[k]:.0f}%]"
                if k in rerun:
                    tag += f"  [rerun {rerun[k].get('rerun', -1):.2f}s]"
                if runs.get(k) == 1:
                    tag += "  [1 run]"
            if len(row) == 4:
                print(f"  {k:45s} {row[1]:8.3f} -> {row[2]:8.3f}  "
                      f"{row[3]:5.2f}x{tag}")
            else:
                print(f"  {k:45s} min={row[1]:.3f} med={row[2]:.3f} "
                      f"spread={row[2] / row[1]:.1f}x")

    show(f"min regressions > {a.threshold}x", regress, mark=True)
    show(f"min improvements > {a.threshold}x", improve, mark=True)
    show("NEW-side contended ops (median/min > 2.5x -- median is load, "
         "read the min)", contended)

    only_o = set(om) - set(nm)
    only_n = set(nm) - set(om)
    if only_o:
        print(f"\nops only in OLD ({len(only_o)}): {sorted(only_o)[:10]}"
              + (" ..." if len(only_o) > 10 else ""))
    if only_n:
        print(f"\nops only in NEW ({len(only_n)}): {sorted(only_n)[:10]}"
              + (" ..." if len(only_n) > 10 else ""))
    if not regress:
        print("\nno min regressions above threshold: totals move = "
              "noise band + coverage delta")


if __name__ == "__main__":
    main()

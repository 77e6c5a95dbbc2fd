#!/usr/bin/env python3
"""Cross-round per-query bench delta (VERDICT r9 #3, retime r10 #5).

Compares the committed BENCH_QUERIES_r{N}.json isolated maps of two
rounds and prints a markdown table of every entry whose ISOLATED time
moved more than the flag threshold — with the noise protocol applied
BY MEASUREMENT, not argument (VERDICT r10 #5):

- the committed regression signal is the "isolated" map (the wall-clock
  catalog total swings 1.5-2.8x with host noise);
- a single isolated reading can spike ~3x in a bad window, so with
  --retime every flagged entry is AUTOMATICALLY re-timed in isolation
  3x (one sbt/Bench process per repetition, SPARK_GRAFT_ONLY scoped to
  the flagged set) and the per-entry MEDIAN of the three runs replaces
  the flagged reading in NEW.json (isolated_total recomputed) — so the
  committed artifact carries the median, and the status column is
  decided by the median ratio, not by a one-shot spike;
- without --retime the old cross-check heuristic still prints (a REAL
  plan regression moves both the isolated and catalog-order maps; a
  spike in one map only is host noise);
- entries faster than FLOOR seconds in both rounds are never flagged
  (sub-100ms readings are scheduler jitter).

Usage: bench_delta.py OLD.json NEW.json [flag_ratio] [floor_sec] [--retime]
"""
import json
import os
import statistics
import subprocess
import sys


def flagged_rows(oiso, niso, flag, floor):
    rows = []
    for q in sorted(set(oiso) & set(niso)):
        a, b = oiso[q], niso[q]
        if a <= 0 or (a < floor and b < floor):
            continue
        ratio = b / a
        if ratio > flag or ratio < 1 / flag:
            rows.append(q)
    return rows


def retime(names, sf_dir, reps=3):
    """Run graft.Bench `reps` times scoped to `names`; per-entry medians.

    Each repetition is its own JVM (cold process, warm OS cache) — the
    same shape as the committed isolated map. Under SPARK_GRAFT_ONLY the
    bench writes target/bench.json only (never the committed root
    artifact) and its "queries" map IS the isolated measurement.
    """
    medians = {q: [] for q in names}
    env = dict(os.environ, SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_SF_DIR=sf_dir)
    for i in range(reps):
        print(f"[retime] pass {i + 1}/{reps} over {len(names)} entries ...",
              file=sys.stderr)
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"[retime] bench failed:\n{r.stdout[-2000:]}\n"
                  f"{r.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        with open("target/bench.json") as f:
            qmap = json.load(f)["queries"]
        for q in names:
            medians[q].append(qmap[q])
    return {q: statistics.median(v) for q, v in medians.items()}, medians


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    do_retime = "--retime" in rest
    rest = [a for a in rest if a != "--retime"]
    flag = float(rest[0]) if len(rest) > 0 else 2.0
    floor = float(rest[1]) if len(rest) > 1 else 0.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oiso, niso = old.get("isolated", {}), new.get("isolated", {})
    ocat, ncat = old.get("queries", {}), new.get("queries", {})

    shared = sorted(set(oiso) & set(niso))
    added = sorted(set(niso) - set(oiso))
    removed = sorted(set(oiso) - set(niso))

    print(f"entries: {len(oiso)} -> {len(niso)} "
          f"(+{len(added)} new, -{len(removed)} removed), "
          f"isolated_total {old.get('isolated_total'):.1f}s -> "
          f"{new.get('isolated_total'):.1f}s")

    med3, raw3 = {}, {}
    flagged = flagged_rows(oiso, niso, flag, floor)
    if do_retime and flagged:
        sf_dir = new.get("sf", "/root/testdata/sf0.1")
        med3, raw3 = retime(flagged, sf_dir)
        # commit the medians into NEW.json: the artifact carries the
        # measurement the status column was decided on
        for q, m in med3.items():
            niso[q] = round(m, 3)
        new["isolated"] = niso
        new["isolated_total"] = round(sum(niso.values()), 3)
        new["retimed_median3"] = {q: [round(x, 3) for x in v]
                                  for q, v in raw3.items()}
        with open(new_path, "w") as f:
            json.dump(new, f)
        print(f"[retime] medians committed to {new_path}; "
              f"isolated_total now {new['isolated_total']:.1f}s")

    rows = []
    for q in shared:
        a, b = oiso[q], niso[q]
        if a <= 0 or (a < floor and b < floor):
            continue
        ratio = b / a
        if q in med3:
            status = ("REGRESSION (median-of-3)" if ratio > flag
                      else "improved (median-of-3)" if ratio < 1 / flag
                      else "noise retired (median-of-3)")
        elif ratio > flag or ratio < 1 / flag:
            both = (q in ocat and q in ncat and ocat[q] > 0
                    and (ncat[q] / ocat[q] > flag) == (ratio > flag)
                    and (ncat[q] / ocat[q] > flag or ncat[q] / ocat[q] < 1 / flag))
            status = ("REGRESSION?" if ratio > flag else "improved") \
                if both else ("noise (isolated only)" if ratio > flag
                              else "improved (isolated only)")
        else:
            continue
        rows.append((q, a, b, ratio,
                     ocat.get(q, float("nan")), ncat.get(q, float("nan")),
                     status))
    rows.sort(key=lambda r: -r[3])
    print("\n| entry | iso old | iso new | ratio | cat old | cat new | status |")
    print("|---|---|---|---|---|---|---|")
    for q, a, b, r, ca, cb, st in rows:
        print(f"| {q} | {a:.2f} | {b:.2f} | {r:.2f}x | {ca:.2f} | {cb:.2f} | {st} |")
    if not rows:
        print("| (none flagged) | | | | | | |")
    if added:
        tot = sum(niso[q] for q in added)
        print(f"\nnew entries this round: {len(added)} "
              f"(isolated sum {tot:.1f}s): "
              + ", ".join(f"{q} {niso[q]:.2f}s" for q in
                          sorted(added, key=lambda q: -niso[q])[:10])
              + (" …" if len(added) > 10 else ""))


if __name__ == "__main__":
    main()

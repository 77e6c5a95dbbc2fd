#!/usr/bin/env python3
"""Cross-round per-query bench delta (VERDICT r9 #3).

Compares the committed BENCH_QUERIES_r{N}.json isolated maps of two
rounds and prints a markdown table of every entry whose ISOLATED time
moved more than the flag threshold — with the noise protocol applied:

- the committed regression signal is the "isolated" map (the wall-clock
  catalog total swings 1.5-2.8x with host noise);
- a single isolated reading can spike ~3x in a bad window, so a flagged
  entry is cross-checked against the same artifact's catalog-order
  ("queries") number: a REAL plan regression moves BOTH maps
  (status=REGRESSION?); a spike in one map only is host noise
  (status=noise);
- entries faster than FLOOR seconds in both rounds are never flagged
  (sub-100ms readings are scheduler jitter).

Usage: bench_delta.py OLD.json NEW.json [flag_ratio] [floor_sec]
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
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
    rows = []
    for q in shared:
        a, b = oiso[q], niso[q]
        if a <= 0 or (a < floor and b < floor):
            continue
        ratio = b / a
        if ratio > flag or ratio < 1 / flag:
            both = (q in ocat and q in ncat and ocat[q] > 0
                    and (ncat[q] / ocat[q] > flag) == (ratio > flag)
                    and (ncat[q] / ocat[q] > flag or ncat[q] / ocat[q] < 1 / flag))
            status = ("REGRESSION?" if ratio > flag else "improved") \
                if both else ("noise (isolated only)" if ratio > flag
                              else "improved (isolated only)")
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

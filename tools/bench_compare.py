"""Probe-normalized per-query bench regression gate.

Compares two bench artifacts and flags queries whose NORMALIZED wall grew
more than THRESHOLD (default 1.3x). Normalization divides machine speed
out of each side: norm_wall = min_wall * (reference_probe / run_probe),
where run_probe is the minimum calibration-probe wall recorded in that
run's BENCH_DETAIL (a loaded machine shows a larger probe, so its walls
deflate back to idle-equivalent). With normalization, "same plan but the
driver box was busy" — the q2-class ambiguity of rounds 6-8 — reads as
ratio ~1.0 instead of a phantom regression.

Accepts either artifact shape:
- BENCH_DETAIL.json — has queries + calibration.probe_sec (normalizable)
- BENCH_r{N}.json   — driver summary, queries only (compared RAW, and the
  report says so; absolute driver rounds also differ by machine, so raw
  ratios there are a smell test, not a verdict)

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Exit status: 0 = no regressions flagged, 1 = at least one flagged.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple:
    """(queries dict, probe estimate or None, label). MEDIAN of the
    calibration probes, not min: one lucky fast probe (cache-warm core,
    momentary idle) used to deflate a whole run's machine-speed estimate
    by 1.3x and flag phantom regressions across untouched queries —
    the median resists outliers in both directions."""
    import statistics
    with open(path) as f:
        d = json.load(f)
    probes = (d.get("calibration") or {}).get("probe_sec")
    probe = statistics.median(probes) if probes else None
    return d.get("queries") or {}, probe, path


def compare(old_path: str, new_path: str, threshold: float = 1.3) -> dict:
    old_q, old_probe, _ = _load(old_path)
    new_q, new_probe, _ = _load(new_path)
    normalized = old_probe is not None and new_probe is not None
    # scale NEW walls into OLD's machine-speed frame; with both probes the
    # reference constant cancels, so the factor is just new_probe-relative
    factor = (old_probe / new_probe) if normalized else 1.0

    rows, flagged = [], []
    for name in sorted(set(old_q) & set(new_q)):
        o, n = float(old_q[name]), float(new_q[name])
        n_adj = n * factor
        # floor tiny absolute walls: a 0.05s->0.09s jitter is scheduling
        # noise, not a regression worth a bisect
        ratio = n_adj / o if o > 1e-9 else float("inf")
        material = n_adj - o > 0.15
        row = {"query": name, "old": round(o, 3), "new_raw": round(n, 3),
               "new_norm": round(n_adj, 3), "ratio": round(ratio, 2)}
        rows.append(row)
        if ratio > threshold and material:
            flagged.append(row)
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    return {"normalized": normalized,
            "probe_factor": round(factor, 4),
            "threshold": threshold,
            "flagged": flagged, "rows": rows,
            "only_in_old": only_old, "only_in_new": only_new}


def main(argv) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    threshold = 1.3
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    rep = compare(argv[1], argv[2], threshold)
    mode = ("probe-normalized (factor %.4f)" % rep["probe_factor"]
            if rep["normalized"] else "RAW (no calibration in one side)")
    print(f"# bench_compare {argv[1]} -> {argv[2]}: {mode}, "
          f"threshold {threshold}x")
    for r in rep["flagged"]:
        print(f"REGRESSION {r['query']}: {r['old']}s -> {r['new_norm']}s "
              f"normalized ({r['new_raw']}s raw), {r['ratio']}x")
    if not rep["flagged"]:
        print("no regressions flagged")
    if rep["only_in_old"]:
        print("dropped queries:", ", ".join(rep["only_in_old"]))
    if rep["only_in_new"]:
        print("new queries:", ", ".join(rep["only_in_new"]))
    print(json.dumps({k: rep[k] for k in
                      ("normalized", "probe_factor", "flagged")},
                     separators=(",", ":")))
    return 1 if rep["flagged"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

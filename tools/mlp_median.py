"""Aggregate multi-window perf rows into a quotable median row
(VERDICT r4 weak #1 / next #4: no single-window throughput may be
quoted as a headline — session variance is 2-5× on this tunnel).

    python tools/mlp_median.py --tag-prefix r5-mlp-w --min-windows 3

Reads perf_results/perf.jsonl rows whose tag starts with the prefix
(e.g. r5-mlp-w1 / r5-mlp-w2 / r5-mlp-w3 measured in separate session
windows), groups by (network, route, batch, path), and appends ONE
consolidated row per group with:
  - img/s median across windows + every per-window value,
  - window_spread = (max-min)/median ACROSS windows (the honest
    variance a reader must apply to the median),
  - quotable: true only when >= min_windows windows contributed.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag-prefix", required=True)
    ap.add_argument("--min-windows", type=int, default=3)
    ap.add_argument("--out-tag", default="")
    ap.add_argument("--path", default="perf_results/perf.jsonl")
    args = ap.parse_args()

    groups = {}
    for line in open(args.path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        tag = r.get("tag", "")
        if not tag.startswith(args.tag_prefix) or "images_per_sec" not in r:
            continue
        key = (r["network"], r["route"], r["batch"], r.get("path", "logits"))
        groups.setdefault(key, []).append(r)

    out_tag = args.out_tag or args.tag_prefix.rstrip("-w") + "-median"
    rows = []
    for (net, route, batch, path), rs in sorted(groups.items()):
        vals = sorted(x["images_per_sec"] for x in rs)
        med = vals[len(vals) // 2]
        row = {
            "network": net, "route": route, "batch": batch, "path": path,
            "images_per_sec_median": med,
            "windows": [
                {"tag": x.get("tag"), "images_per_sec": x["images_per_sec"],
                 "spread": x.get("spread"), "calib_ms": x.get("calib_ms"),
                 "floor_ms": x.get("floor_ms")} for x in rs],
            "n_windows": len(rs),
            "window_spread": round((vals[-1] - vals[0]) / med, 3)
            if med else 0.0,
            "quotable": len(rs) >= args.min_windows,
            "verify_ok": all(x.get("verify_ok", True) for x in rs),
            "tag": out_tag,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(args.path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if not rows:
        print("no matching rows", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

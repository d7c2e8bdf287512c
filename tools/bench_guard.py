#!/usr/bin/env python
"""Bench regression guard (round-5, VERDICT r04 #6).

Compares a fresh ``bench.py`` JSON line (or a saved one) against the most
recent committed ``BENCH_r*.json`` and flags lanes whose throughput fell by
more than the stated contention band.  The chip-contention probe sentinel
(``probe_ms_before/after``, idle-chip nominal ~1-2 ms) attributes overage:
a slow probe means the spread is shared-chip load, not a code regression —
those lanes are reported as CONTENDED instead of REGRESSED.

Usage:
    python tools/bench_guard.py                  # runs bench.py (slow)
    python tools/bench_guard.py --new out.json   # compare a saved run
    python tools/bench_guard.py --band 0.25      # custom band

Exit status: 0 = no unattributed regression, 1 = regression, 2 = usage.
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# lane name -> path of its value + its probe fields inside the artifact
LANES = {
    "headline": ((), "value"),
    "large": (("large_config",), "value"),
    "shared": (("shared_plant_config",), "value"),
    "nonlin": (("nonlin_config",), "value"),
    "mhe": (("mhe_config",), "value"),
    "mhe_nonlin": (("mhe_nonlin_config",), "value"),
    "slmpc": (("slmpc_config",), "value"),
    "explicit": (("explicit_config",), "value"),
}
PROBE_CONTENDED_MS = 3.0     # idle-chip probe is ~1-2 ms


def _get(d, path, key):
    for p in path:
        d = d.get(p) or {}
    v = d.get(key)
    return float(v) if v is not None else None


def _latest_baseline():
    runs = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not runs:
        return None, None
    with open(runs[-1]) as fh:
        data = json.load(fh)
    # driver artifacts wrap the JSON line in {"tail": "..."} — unwrap.
    # The tail may be TRUNCATED at the front (the driver keeps only the
    # last N bytes), so fall back to regex-recovering the per-lane values.
    if "tail" in data and isinstance(data["tail"], str):
        t = data["tail"]
        for line in reversed(t.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line), runs[-1]
                except json.JSONDecodeError:
                    break
        rec = {}
        for lane, (path, _) in LANES.items():
            if not path:
                continue
            m = re.search(r'"%s":\s*\{[^{}]*?"value":\s*([0-9.eE+-]+)'
                          % path[0], t)
            if m:
                rec[path[0]] = {"value": float(m.group(1))}
        m = re.search(r'"headline_runs_solves_per_s":\s*\[([0-9.,\s eE+-]+)\]',
                      t)
        if m:
            rec["value"] = max(float(x) for x in m.group(1).split(","))
        for k in ("probe_ms_before", "probe_ms_after"):
            m = re.search(r'"%s":\s*([0-9.eE+-]+)' % k, t)
            if m:
                rec[k] = float(m.group(1))
        return rec, runs[-1] + " (regex-recovered from truncated tail)"
    return data, runs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", help="path to a fresh bench JSON line "
                                  "(default: run bench.py)")
    ap.add_argument("--band", type=float, default=0.25,
                    help="allowed fractional drop before flagging (0.25 = "
                         "25%%; covers normal shared-chip spread)")
    args = ap.parse_args()

    old, old_path = _latest_baseline()
    if old is None:
        print("no BENCH_r*.json baseline found", file=sys.stderr)
        return 2
    if args.new:
        with open(args.new) as fh:
            txt = fh.read()
        new = None
        for line in reversed(txt.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                new = json.loads(line)
                break
        if new is None:
            print(f"no JSON line in {args.new}", file=sys.stderr)
            return 2
    else:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        new = json.loads([ln for ln in r.stdout.strip().splitlines()
                          if ln.strip().startswith("{")][-1])

    probes = [new.get("probe_ms_before"), new.get("probe_ms_after"),
              old.get("probe_ms_before"), old.get("probe_ms_after")]
    contended = any(p is not None and p > PROBE_CONTENDED_MS for p in probes)

    status = 0
    print(f"baseline: {old_path}  band: -{args.band:.0%}  "
          f"probes(ms): {probes} {'[CONTENDED]' if contended else ''}")
    for lane, (path, key) in LANES.items():
        v_old = _get(old, path, key)
        v_new = _get(new, path, key)
        if v_old is None or v_new is None:
            print(f"  {lane:10s}: skipped (missing in "
                  f"{'baseline' if v_old is None else 'new run'})")
            continue
        ratio = v_new / v_old
        if ratio >= 1.0 - args.band:
            verdict = "ok"
        elif contended:
            verdict = "CONTENDED (probe attributes the drop to chip load)"
        else:
            verdict = "REGRESSED"
            status = 1
        print(f"  {lane:10s}: {v_old:12.0f} -> {v_new:12.0f}  "
              f"({ratio:5.2f}x)  {verdict}")
    return status


if __name__ == "__main__":
    sys.exit(main())

"""Merge individual tools/soak.py run files into the SOAK.json artifact.

Usage: python tools/soak_merge.py /tmp/soak_64.json /tmp/soak_128.json ... \
           --out SOAK.json --note "..."
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--out", default="SOAK.json")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    runs = [json.loads(Path(p).read_text()) for p in args.runs]
    runs.sort(key=lambda r: r["channels"])

    passing = [r for r in runs
               if r["spots"] and r["deadline_misses"] == 0]
    max_pass = max((r["channels"] for r in passing), default=None)
    worst = max(runs, key=lambda r: r["channels"])
    summary = {
        "stale_drops_any": sum(r["stale_drops"] for r in runs),
        "ingest_overruns_any": sum(r["ingest_overruns"] for r in runs),
        "scheduler_verdict": (
            "zero stale drops and zero ingest overruns at every tested "
            "channel count; no window was ever shed"
            if not any(r["stale_drops"] or r["ingest_overruns"] for r in runs)
            else "see per-run counters"),
        "max_channels_meeting_deadline": max_pass,
        "realtime_verdict": (
            f"p95 spot latency < {runs[0]['deadline_s']:.0f} s deadline met "
            f"live up to {max_pass} channels in this dev environment; "
            f"per-stage breakdown for the {worst['channels']}-channel run "
            "shows where the budget goes (see stages)"
            if max_pass else
            "deadline missed at all tested counts; see stages breakdown"),
    }
    out = {"summary": summary, "runs": runs}
    if args.note:
        out["environment_note"] = args.note
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

"""Summarize queue_results.log: one line per queue step.

Pulls each `=== <label> — <date>` header and the salient result lines that
follow it (bench JSON, probe `RESULT`/`ms` lines, spill counts), so flip
decisions after `bash probes/run_queue.sh >> queue_results.log` are a
single glance:

    python probes/summarize.py [queue_results.log]
"""
from __future__ import annotations

import json
import re
import sys


def main(path: str = "queue_results.log") -> None:
    try:
        lines = open(path, errors="replace").read().splitlines()
    except FileNotFoundError:
        print(f"(no {path} yet)")
        return
    cur = None
    picks: list[tuple[str, list[str]]] = []
    for ln in lines:
        m = re.match(r"^=== (.*?) — ", ln)
        if m:
            cur = (m.group(1), [])
            picks.append(cur)
            continue
        if cur is None:
            continue
        s = ln.strip()
        if s.startswith("{") and '"metric"' in s:
            try:
                d = json.loads(s)
                cur[1].append(
                    f"{d.get('value')} {d.get('unit', '')}"
                    f" (vs_baseline {d.get('vs_baseline')})")
            except json.JSONDecodeError:
                cur[1].append(s)
        elif re.search(r"\b(RESULT|ms/launch|ms/tile|spill|PSNR|dB)\b", s) \
                and len(cur[1]) < 8:
            cur[1].append(s)
        elif s.startswith(("Traceback", "TimeoutError", "jaxlib.")) \
                and not any("ERROR" in x for x in cur[1]):
            cur[1].append("ERROR: " + s)
    for label, results in picks:
        if not results:
            print(f"{label:60s}  (no result)")
        else:
            print(f"{label:60s}  {results[0]}")
            for r in results[1:]:
                print(f"{'':60s}  {r}")


if __name__ == "__main__":
    main(*sys.argv[1:2] or ["queue_results.log"])

#!/usr/bin/env python3
"""Decode a driver BENCH_r<N>.json artifact (or raw Bench stdout) into a
named per-query seconds table.

Usage: python3 tools/parse_bench.py <BENCH_rN.json | bench_stdout.log> [sfDir]

The bench headline carries per-query seconds as a POSITIONAL 3-dp array
(`qsec`) in sorted benched-name order, so the full 146-query record fits the
artifact's 2000-char stdout tail. Names come from tools/bench_prev.json for
the same sf dir (that file is committed by every full run and its keys ARE
the sorted benched names); on a count mismatch (the surface changed between
the artifact and the baseline) positions are printed instead of names rather
than guessing. Driver-side tooling only.
"""
import json
import re
import sys
from pathlib import Path


def headline(text: str) -> dict:
    # a driver artifact is JSON with the (already-escaped) stdout tail in
    # its "tail" field; json.loads unescapes it. Raw Bench stdout passes
    # through unchanged.
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    start = text.rfind('{"metric":"total"')
    if start < 0:
        raise SystemExit("no bench headline found")
    depth = 0
    for i in range(start, len(text)):
        depth += text[i] == "{"
        depth -= text[i] == "}"
        if depth == 0:
            return json.loads(text[start : i + 1])
    raise SystemExit("bench headline is truncated mid-object")


def main() -> int:
    text = Path(sys.argv[1]).read_text()
    h = headline(text)
    sf = sys.argv[2] if len(sys.argv) > 2 else h.get("sf", "")
    if "queries" in h:  # pre-round-9 headline: named map in-line
        rows = list(h["queries"].items())
    else:
        qsec = h.get("qsec", [])
        names = []
        prev_file = Path(__file__).resolve().parent / "bench_prev.json"
        if prev_file.exists():
            names = sorted(json.loads(prev_file.read_text()).get(sf, {}))
        if len(names) != len(qsec):
            print(f"# name/count mismatch (baseline {len(names)} vs qsec "
                  f"{len(qsec)}); printing positions", file=sys.stderr)
            names = [f"pos_{i:03d}" for i in range(len(qsec))]
        rows = list(zip(names, qsec))
    print(f"total={h['value']:.1f}s n={h.get('n_queries', len(rows))} "
          f"n_err={h.get('n_err', '?')} flagged={h.get('n_flagged', 0)} sf={sf}")
    for name, sec in sorted(rows, key=lambda kv: -(kv[1] or 0)):
        print(f"{name:34s} {'ERR' if sec is None else f'{sec:8.3f}'}")
    for name, pv in h.get("flagged", {}).items():
        print(f"REGRESSION {name}: {pv['prev']} -> {pv['cur']}")
    return 0


if __name__ == "__main__":
    # behave under `| head`: die silently on a closed pipe
    from signal import SIG_DFL, SIGPIPE, signal
    signal(SIGPIPE, SIG_DFL)
    sys.exit(main())

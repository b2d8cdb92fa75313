#!/usr/bin/env python3
"""Merge N full-run bench maps into one per-query-MEDIAN baseline.

The tripwire baseline (tools/bench_prev.json) flags any query >1.3x its
recorded time. A single idle run is the wrong reference on a box with
bursty background load: contention windows of ~10s inflate runs of
ADJACENT sub-second queries 3-5x (all three in-JVM trials of a 0.2s
query fit inside one window, so the per-query trial median cannot see
it), and two same-day idle runs cross-flag each other ~25 times purely
on where those windows landed. The per-query MEDIAN across >=3 same-day
idle runs cancels window placement: an entry is only as slow as the
majority of independent runs said it was.

Usage: median_bench_maps.py out.json run1.json run2.json [run3.json ...]
Each input is a Bench.writePrev artifact: {"<sfDir>": {"<query>": sec}}.
A query present in only some runs takes the median of the runs that
have it (a query added mid-day is covered by the runs after it landed).
The output keeps Bench's exact shape/sorting so Bench.readPrev parses it
and subsequent full idle runs overwrite it normally.
"""
import json
import statistics
import sys
from decimal import Decimal


def main() -> None:
    out_path, *in_paths = sys.argv[1:]
    if not in_paths:
        sys.exit("need at least one input map")
    runs = [json.load(open(p)) for p in in_paths]
    sfs = sorted({sf for r in runs for sf in r})
    merged = {}
    for sf in sfs:
        maps = [r[sf] for r in runs if sf in r]
        queries = sorted({q for m in maps for q in m})
        merged[sf] = {
            q: statistics.median([m[q] for m in maps if q in m]) for q in queries
        }
        print(
            f"{sf}: {len(merged[sf])} queries, "
            f"total {sum(merged[sf].values()):.1f}s "
            f"(median of {len(maps)} runs)"
        )
    def plain(v: float) -> str:
        # fixed-point, never scientific: '%s' % 1e-05 -> '1e-05', which
        # Bench.readPrev's number regex would mangle. Decimal(repr(v))
        # keeps the double's full shortest-repr precision (the old .12f
        # rounded 12 places in and collapsed sub-5e-13 values to "0"),
        # matching Bench.writePrev's BigDecimal.toPlainString round-trip.
        s = format(Decimal(repr(v)), "f")
        return s if s else "0"

    body = ",".join(
        '"%s":{%s}'
        % (sf, ",".join('"%s":%s' % (q, plain(v)) for q, v in sorted(qs.items())))
        for sf, qs in sorted(merged.items())
    )
    with open(out_path, "w") as f:
        f.write("{" + body + "}\n")


if __name__ == "__main__":
    main()

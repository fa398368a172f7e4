#!/usr/bin/env python3
"""Adjudicate a BENCH_LOCAL artifact against the committed cpu bands.

Usage: band_check.py BENCH_LOCAL_rN.json [bands.json]

Each banded query's cpu_s is divided by the artifact's own normalizer
mean and compared to the pinned band center (see cpu_bands.json). A
query flags only under the two-bar rule — >25% normalized deviation
AND >0.3 raw cpu_s vs the band's raw center — because under either
bar alone the delta is indistinguishable from this box's measured
minute-scale gust noise. An isolated flag in an untouched file whose
sibling legs read in-band is weather; a real regression concentrates
in touched operators and survives a re-run (PLANS §r20 wrap).

Exit code: 0 when every banded query is present and in band, 3
(advisory) when anything flags OR a banded query is missing from the
artifact — the flag is a prompt to adjudicate, not a verdict by
itself.
"""
import json
import os
import sys


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    here = os.path.dirname(os.path.abspath(__file__))
    bands_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(here, "cpu_bands.json")
    with open(sys.argv[1]) as f:
        d = json.load(f)
    with open(bands_path) as f:
        spec = json.load(f)
    if "norm_cpu_s_start" not in d or "norm_cpu_s_end" not in d:
        sys.exit(f"{sys.argv[1]} carries no normalizer — band "
                 "adjudication needs one (artifacts r19+)")
    norm = (float(d["norm_cpu_s_start"]) + float(d["norm_cpu_s_end"])) / 2
    pinned_norm = float(spec["pinned_norm_mean"])
    cpu = d.get("cpu_s", {})
    print(f"artifact {sys.argv[1]}  norm={norm:.3f}  "
          f"(bands pinned from {spec['pinned_from']} @ {pinned_norm:.3f})")
    flags = []
    missing = []
    for q, band in sorted(spec["bands"].items(),
                          key=lambda kv: -kv[1]):
        if q not in cpu:
            # a banded query the artifact never measured is itself an
            # advisory condition — a crashed/renamed run must not read
            # as "fully in band" to an exit-code consumer
            print(f"  MISS {q:42s} not in artifact")
            missing.append(q)
            continue
        ratio = cpu[q] / norm
        dev = ratio / band - 1
        raw = cpu[q] - band * pinned_norm
        hot = abs(dev) > 0.25 and abs(raw) > 0.3
        if hot:
            flags.append(q)
        mark = "FLAG" if hot else "    "
        print(f"  {mark} {q:42s} band {band:.4f} now {ratio:.4f} "
              f"({dev:+.1%}; raw {raw:+.2f} cpu_s)")
    print(f"\nflagged: {len(flags)}"
          + (f" — {', '.join(flags)}" if flags else "")
          + (f"; missing: {len(missing)} — {', '.join(missing)}"
             if missing else ""))
    sys.exit(3 if flags or missing else 0)


if __name__ == "__main__":
    main()

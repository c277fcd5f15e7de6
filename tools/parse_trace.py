"""Parse the framework_op_stats from a captured xplane and print ranked ops."""

from __future__ import annotations

import glob
import json
import sys


def main(outdir="/tmp/trace", top=40):
    top = int(top)
    files = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    try:
        from xprof.convert import raw_to_tool_data as r2t
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([files[-1]], "framework_op_stats", {"tqx": "out:json"})
    table = json.loads(data) if isinstance(data, (str, bytes)) else data
    rows = []
    # the tool emits the same table more than once (combined + per-host
    # views); consume only the FIRST table containing Device rows — the
    # combined view — rather than deduping on value-equality of row stats,
    # which could merge genuinely distinct rows across views
    for t in table:
        for r in t.get("rows", []):
            c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
            # cols: rank, host/device, type, name, occ, total, avg, total_self, avg_self, dev%...
            if c[1] != "Device":
                continue
            rows.append((c[7], c[4], c[8], c[2], c[3]))
        if rows:
            break
    rows.sort(key=lambda r: -r[0])
    total = sum(r[0] for r in rows)
    print(f"total device self time: {total/1e3:.1f} ms (over the traced window)")
    acc = 0.0
    for self_t, occ, avg, typ, name in rows[:top]:
        acc += self_t
        short = name.split("/")[-1] if len(name) > 90 else name
        tail = "/".join(name.split("/")[-5:])
        print(f"{self_t/1e3:9.2f} ms  {100*self_t/total:5.1f}% (cum {100*acc/total:5.1f}%)  x{int(occ):4d}  avg {avg:8.1f} us  {typ:18s} {tail}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))

"""Summarize an xprof trace directory into an op-level time table.

  python scripts/parse_xprof.py /tmp/prof_fine [--top 25]

Groups HLO ops by category / fusion name and prints self-time shares, plus
the overview page's step-time and memory-bandwidth summary when available.
"""

import argparse
import glob
import gzip
import json
import os


def find_xspace(logdir: str) -> str:
    hits = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
    if not hits:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    return max(hits, key=os.path.getmtime)


def tool_data(xspace: str, tool: str):
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data([xspace], tool, {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tool", default="framework_op_stats")
    args = ap.parse_args()
    xspace = find_xspace(args.logdir)

    data = tool_data(xspace, args.tool)
    try:
        parsed = json.loads(data)
    except json.JSONDecodeError:
        print(data[:4000])
        return
    # framework_op_stats: list of tables; first is per-op.
    if isinstance(parsed, list) and parsed and "p" in str(parsed[0])[:200]:
        pass
    # Generic gviz-table walk: find rows with (occurrences, type, name, ...).
    tables = parsed if isinstance(parsed, list) else [parsed]
    for t in tables:
        cols = [c.get("label", c.get("id", "?")) for c in t.get("cols", [])]
        rows = t.get("rows", [])
        if not rows:
            continue
        print("== table:", cols[:8])
        try:
            self_i = next(i for i, c in enumerate(cols)
                          if "self" in c.lower() and "time" in c.lower())
        except StopIteration:
            self_i = None
        def val(r, i):
            v = r["c"][i]
            return v.get("v") if isinstance(v, dict) else v
        if self_i is not None:
            rows = sorted(rows, key=lambda r: -(val(r, self_i) or 0))
        for r in rows[:args.top]:
            print([val(r, i) for i in range(min(len(cols), 8))])
        break


if __name__ == "__main__":
    main()

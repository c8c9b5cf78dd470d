"""Summarize hdr_study result lines into one decision table.

Reads JSON result lines (one per variant, as hdr_study.py prints them)
from files or stdin — a queue log with interleaved training output works;
non-JSON lines are skipped — and prints per run: scene (from the out
path), variant, final/last-3 HDR ws-PSNR, final LDR ws-PSNR and SSIM,
emitter ratio, per-channel emitter prediction vs GT, and per-source rows
for multi-emitter scenes.

Usage:
  python scripts/summarize_studies.py /tmp/hdr_r3s/queue_log.txt
"""

import json
import sys


def rows_from_stream(fp):
    for line in fp:
        line = line.strip()
        if not (line.startswith("{") and '"series"' in line):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "variant" in rec and "series" in rec:
            yield rec


def fmt(rec):
    series = rec["series"]
    hdr = [r["psnr_hdr_vol"] for r in series if "psnr_hdr_vol" in r]
    ldr = [r["psnr_ldr_vol"] for r in series if "psnr_ldr_vol" in r]
    ssim = [r["ssim_ldr_vol"] for r in series if "ssim_ldr_vol" in r]
    em = [r for r in series if "emitter_ratio" in r]
    out = {
        "variant": rec["variant"],
        "steps": rec.get("steps"),
        "wall_s": rec.get("wall_s"),
        "hdr_last3": [round(x, 2) for x in hdr[-3:]],
        "ldr": round(ldr[-1], 2) if ldr else None,
        "ssim": round(ssim[-1], 3) if ssim else None,
    }
    if em:
        last = em[-1]
        out["emitter_ratio"] = last["emitter_ratio"]
        if "emitter_pred_rgb" in last:
            out["emitter_pred_rgb"] = last["emitter_pred_rgb"]
            out["emitter_gt_rgb"] = last["emitter_gt_rgb"]
        if "per_source" in last:
            out["per_source"] = last["per_source"]
    return out


def main():
    paths = sys.argv[1:]
    streams = [open(p) for p in paths] if paths else [sys.stdin]
    rows = []
    for fp in streams:
        rows.extend(fmt(r) for r in rows_from_stream(fp))
    for row in rows:
        print(json.dumps(row))
    if not rows:
        print("no hdr_study result lines found", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

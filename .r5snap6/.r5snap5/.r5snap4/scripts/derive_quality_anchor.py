"""Derive the reference-side time-to-quality anchor (VERDICT r2 #3).

Inputs:
  * REF_STEPS_TO_TARGET.json — written by scripts/bench_reference_torch.py
    --steps-to-target: the torch reference's val ws-PSNR curve on a reduced
    matched config (steps are hardware-independent, so a CPU run anchors
    them).
  * the matched-config run of OUR trainer on the SAME scene/config
    (scripts/bench_quality.py --opts ... output JSON, --ours_json).

If both curves reach the target, the step counts anchor directly. When the
reduced config cannot reach the headline target for either side (the
64x128 scene at 16 samples tops out near 20 dB), the anchor becomes the
measured STEP RATIO at the highest threshold both curves cross: the ratio
of reference steps to our steps to reach identical quality, assumed to
transfer to the full config (documented in BASELINE.md). Both the measured
ratio and the reference-favoring ratio=1 bound are stored;
scripts/bench_quality.py consumes them to report vs_baseline.

Usage:
  python scripts/derive_quality_anchor.py --ours_json /tmp/ours_matched.json
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def steps_to(curve, threshold):
    """First step whose PSNR >= threshold (linear scan; curve is
    [(step, psnr), ...] in step order), or None."""
    for step, p in curve:
        if p >= threshold:
            return step
    return None


def best_common_threshold(ref_curve, ours_curve, grid=0.25):
    """Highest PSNR level both curves reach, quantized to `grid` dB."""
    top = min(max(p for _, p in ref_curve), max(p for _, p in ours_curve))
    return int(top / grid) * grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours_json", required=True,
                    help="bench_quality.py JSON from the matched run "
                         "(file, or a log whose last JSON line is it)")
    ap.add_argument("--ref_json",
                    default=os.path.join(REPO, "REF_STEPS_TO_TARGET.json"))
    args = ap.parse_args()

    with open(args.ref_json) as fp:
        ref = json.load(fp)
    with open(args.ours_json) as fp:
        ours = None
        for line in fp:
            line = line.strip()
            if line.startswith("{") and "psnr_curve" in line:
                ours = json.loads(line)
    assert ours is not None, "no bench_quality JSON found in --ours_json"

    ref_curve = [tuple(x) for x in ref["psnr_curve"]]
    ours_curve = [tuple(x) for x in ours["psnr_curve"]]
    out = dict(ref)
    target = ref["target_ldr_ws_psnr"]

    if ref.get("steps_to_target") and ours.get("steps_to_target"):
        out["ours_steps_matched"] = ours["steps_to_target"]
        out["ratio_threshold_db"] = target
        out["step_ratio"] = round(
            ref["steps_to_target"] / ours["steps_to_target"], 4)
    else:
        thr = best_common_threshold(ref_curve, ours_curve)
        rs, os_ = steps_to(ref_curve, thr), steps_to(ours_curve, thr)
        assert rs and os_, (thr, "curves never cross the common threshold")
        out["ours_steps_matched"] = os_
        out["ratio_threshold_db"] = thr
        out["step_ratio"] = round(rs / os_, 4)
    out["ours_matched_curve"] = ours["psnr_curve"]
    # The reference-favoring bound: pretend the reference needs no more
    # steps than we do (measured it needs step_ratio x as many).
    out["step_ratio_conservative"] = 1.0

    with open(args.ref_json, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({"ratio_threshold_db": out["ratio_threshold_db"],
                      "ref_steps": steps_to(ref_curve,
                                            out["ratio_threshold_db"]),
                      "ours_steps": out["ours_steps_matched"],
                      "step_ratio": out["step_ratio"]}))


if __name__ == "__main__":
    main()

"""scripts/derive_quality_anchor.py: step-ratio derivation from matched
PSNR curves (the reference-side time-to-quality anchor, VERDICT r2 #3)."""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "derive_quality_anchor",
    os.path.join(ROOT, "scripts", "derive_quality_anchor.py"))
dqa = importlib.util.module_from_spec(spec)
spec.loader.exec_module(dqa)


class TestStepRatio:
    def test_steps_to_first_crossing(self):
        curve = [(100, 10.0), (200, 15.0), (300, 15.2), (400, 17.0)]
        assert dqa.steps_to(curve, 15.0) == 200
        assert dqa.steps_to(curve, 16.9) == 400
        assert dqa.steps_to(curve, 18.0) is None

    def test_best_common_threshold_quantized(self):
        ref = [(100, 10.0), (200, 17.12)]
        ours = [(100, 12.0), (200, 19.8)]
        # min of maxima = 17.12, quantized down to 17.0.
        assert dqa.best_common_threshold(ref, ours, grid=0.25) == 17.0

    def test_end_to_end_ratio(self, tmp_path):
        """Full CLI run over synthetic curve files: writes step_ratio and
        the matched curve back into the ref JSON."""
        ref = {"mode": "reference_steps_to_target_cpu",
               "target_ldr_ws_psnr": 25.0, "steps_to_target": None,
               "psnr_curve": [[1000, 14.0], [2000, 16.0], [3000, 17.0],
                              [4000, 17.5]]}
        ref_f = tmp_path / "REF.json"
        ref_f.write_text(json.dumps(ref))
        ours = {"metric": "time_to_25dB_ldr_ws_psnr", "value": None,
                "steps_to_target": None,
                "psnr_curve": [[1000, 16.0], [2000, 17.6], [3000, 19.0]]}
        ours_f = tmp_path / "ours.log"
        ours_f.write_text("noise\n" + json.dumps(ours) + "\n")

        argv = sys.argv
        sys.argv = ["x", "--ours_json", str(ours_f),
                    "--ref_json", str(ref_f)]
        try:
            dqa.main()
        finally:
            sys.argv = argv
        out = json.loads(ref_f.read_text())
        # Common threshold 17.5; ref crosses at 4000, ours at 2000.
        assert out["ratio_threshold_db"] == 17.5
        assert out["ours_steps_matched"] == 2000
        assert out["step_ratio"] == 2.0
        assert out["step_ratio_conservative"] == 1.0
        assert out["ours_matched_curve"] == ours["psnr_curve"]

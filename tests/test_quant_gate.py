"""The mechanical int8 promotion gate (scripts/quant_fidelity.py --gate).

DESIGN.md §10 records four promotion criteria; the gate turns them into one
JSON verdict a user with pretrained weights can produce with a single
command. Two properties are load-bearing and tested here:

  1. `gate_verdict` is a PURE function of the measurements, so the
     threshold logic (PASS/FAIL per criterion, BLOCKED on random weights)
     is pinned without a TPU run.
  2. The collectors + verdict run END-TO-END on a tiny config: on random
     weights every criterion must come out BLOCKED (never a silent PASS),
     while still carrying its measured value and would-be decision.
"""

import argparse
import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "quant_fidelity", os.path.join(REPO, "scripts", "quant_fidelity.py"))
qf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(qf)


def _passing_meas():
    return {
        "fidelity": {
            "objectives": [{"spearman_per_pop": [0.95, 0.92, 0.93, 0.96],
                            "topk_per_pop": [0.875, 1.0, 0.875, 0.875]}],
            "survival_overlap_per_pop": [0.9, 0.875, 0.9, 0.875],
            "k": 8,
        },
        "ab": {"bf16": [-0.30, -0.32, -0.34, -0.31, -0.33],
               "int8": [-0.31, -0.31, -0.33, -0.32, -0.33]},
        "saturation": {"eligible_sites": 40, "max_ratio": 0.93,
                       "mean_ratio": 0.7},
    }


def _by_name(verdict):
    return {c["criterion"]: c for c in verdict["criteria"]}


def test_gate_verdict_pretrained_all_pass():
    v = qf.gate_verdict(_passing_meas(), pretrained=True)
    assert v["overall"] == "PASS"
    c = _by_name(v)
    assert set(c) == {"rank_fidelity", "selection_fidelity", "outcome_ab",
                      "calibration_saturation"}
    assert all(x["status"] == "PASS" for x in c.values())
    assert c["rank_fidelity"]["measured"] == 0.92  # min over pops, not mean
    assert c["selection_fidelity"]["measured"]["survival_overlap"] == 0.8875


def test_gate_verdict_pretrained_single_fail():
    m = _passing_meas()
    # one population below the per-pop rank bar -> criterion 1 fails
    m["fidelity"]["objectives"][0]["spearman_per_pop"][1] = 0.88
    v = qf.gate_verdict(m, pretrained=True)
    assert v["overall"] == "FAIL"
    c = _by_name(v)
    assert c["rank_fidelity"]["status"] == "FAIL"
    assert c["selection_fidelity"]["status"] == "PASS"


def test_gate_verdict_ab_worst_seed():
    m = _passing_meas()
    # bf16 spread is 0.04; one int8 seed regressing by 0.08 > 1.5 * spread
    m["ab"]["int8"][2] = m["ab"]["bf16"][2] + 0.08
    v = qf.gate_verdict(m, pretrained=True)
    c = _by_name(v)
    assert c["outcome_ab"]["status"] == "FAIL"
    assert c["outcome_ab"]["measured"]["worst_seed_regression"] == 0.08


def test_gate_verdict_insufficient_samples_cannot_pass():
    m = _passing_meas()
    m["fidelity"]["objectives"][0]["spearman_per_pop"] = [0.99, 0.99]
    m["ab"] = {"bf16": [-0.30, -0.32], "int8": [-0.31, -0.31]}
    v = qf.gate_verdict(m, pretrained=True)
    c = _by_name(v)
    assert c["rank_fidelity"]["status"] == "FAIL"
    assert ">= 4" in c["rank_fidelity"]["detail"]
    assert c["outcome_ab"]["status"] == "FAIL"
    assert ">= 5" in c["outcome_ab"]["detail"]


def test_gate_verdict_random_weights_blocked_never_passes():
    v = qf.gate_verdict(_passing_meas(), pretrained=False)
    assert v["overall"] == "BLOCKED"
    for c in v["criteria"]:
        assert c["status"] == "BLOCKED"
        assert "pretrained" in c["note"]
        assert c["would"] == "PASS"      # measured outcome still reported
        assert "measured" in c and "threshold" in c


def test_gate_verdict_saturation_no_op_config():
    m = _passing_meas()
    m["saturation"] = {"eligible_sites": 0, "max_ratio": 0.0,
                       "mean_ratio": 0.0}
    v = qf.gate_verdict(m, pretrained=True)
    c = _by_name(v)["calibration_saturation"]
    assert c["status"] == "PASS"
    assert "structural no-op" in c["detail"]


def test_gate_end_to_end_tiny(capsys):
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.stylegan2 import model as sg2

    cfg = get_config("StyleGAN2_ffhq_d").replace(
        weights="random:0", target="a face", pop_size=8, dim_z=32, n_var=32,
        compute_dtype="float32", quantize_min_ch=1)
    args = argparse.Namespace(pops=2, gate_seeds=2, generations=2)
    v = qf.run_gate(cfg, args,
                    pb_kwargs=dict(clip_cfg=clip_model.TINY,
                                   model_cfg=sg2.TINY),
                    log=lambda *a, **k: None)
    # stdout is exactly one parseable JSON line (the documented contract)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    import json
    assert json.loads(out[0]) == v

    assert v["overall"] == "BLOCKED" and v["pretrained"] is False
    assert v["config"] == "StyleGAN2_ffhq_d"
    c = _by_name(v)
    assert set(c) == {"rank_fidelity", "selection_fidelity", "outcome_ab",
                      "calibration_saturation"}
    for x in c.values():
        assert x["status"] == "BLOCKED"
        assert x["would"] in ("PASS", "FAIL")
    # the tiny flagship has eligible conv sites and the fresh-population
    # ratio is a real finite measurement
    assert "call sites" in c["calibration_saturation"]["detail"]
    assert np.isfinite(c["calibration_saturation"]["measured"])
    assert -1.0 <= c["rank_fidelity"]["measured"] <= 1.0

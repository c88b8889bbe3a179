"""scripts/parse_trace.py: the trace aggregation + --hlo fusion-attribution
tool behind the DESIGN.md §9 per-op roofline table. Synthetic trace + HLO
text exercise the full pipeline via the CLI (the tool must keep working
standalone — it is part of the documented measurement workflow)."""

import gzip
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HLO = """\
HloModule jit_step

%fused_computation.1 (param_0.3: bf16[2,8,8,4], param_1.4: bf16[3,3,4,4]) -> bf16[2,8,8,4] {
  %param_0.3 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %param_1.4 = bf16[3,3,4,4]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %conv_general_dilated.1 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} convolution(%param_0.3, %param_1.4), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

%fused_computation.2 (param_0.9: bf16[2,8,8,4]) -> bf16[2,8,8,4] {
  %param_0.9 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  ROOT %add.5 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} add(%param_0.9, %param_0.9)
}

ENTRY %main.10 () -> bf16[2,8,8,4] {
  %p0.1 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %p1.2 = bf16[3,3,4,4]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %fusion.7 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} fusion(%p0.1, %p1.2), kind=kOutput, calls=%fused_computation.1
  %fusion.8 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} fusion(%fusion.7), kind=kLoop, calls=%fused_computation.2
  ROOT %copy.3 = bf16[2,8,8,4]{3,0,2,1:T(8,128)(2,1)} copy(%fusion.8)
}
"""


def _write_inputs(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 TensorCore"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "python host"}},
        # two steps of each op (dur in microseconds)
        {"ph": "X", "pid": 1, "name": "fusion.7", "dur": 1500, "ts": 0},
        {"ph": "X", "pid": 1, "name": "fusion.7", "dur": 1500, "ts": 10},
        {"ph": "X", "pid": 1, "name": "fusion.8", "dur": 400, "ts": 20},
        {"ph": "X", "pid": 1, "name": "copy.3", "dur": 100, "ts": 30},
        # host-side event must be excluded from device totals
        {"ph": "X", "pid": 2, "name": "hostloop", "dur": 9999, "ts": 0},
    ]
    tdir = tmp_path / "plugins" / "profile" / "2026_01_01"
    tdir.mkdir(parents=True)
    with gzip.open(tdir / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    hlo = tmp_path / "step_hlo.txt"
    hlo.write_text(HLO)
    return tmp_path, hlo


def _run(*argv):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parse_trace.py"),
         *argv],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_table_and_hlo_attribution(tmp_path):
    trace_dir, hlo = _write_inputs(tmp_path)
    out = _run(str(trace_dir), "--steps", "2", "--hlo", str(hlo))
    lines = out.splitlines()
    row7 = next(l for l in lines if "fusion.7" in l)
    # totals: 3.0 ms over 2 steps = 1.5 ms/step, and the conv annotation
    assert "3.00" in row7 and "1.500" in row7
    assert "conv bf16[2,8,8,4] * bf16[3,3,4,4] -> bf16[2,8,8,4]" in row7
    assert "window={size=3x3 pad=1_1x1_1}" in row7
    # non-conv fusion annotated by its root op; plain ops by opcode
    row8 = next(l for l in lines if "fusion.8" in l)
    assert "root=add" in row8
    rowc = next(l for l in lines if "copy.3" in l)
    assert "copy" in rowc
    # the host-side event is excluded
    assert "hostloop" not in out


def test_group_mode_folds_suffixes(tmp_path):
    trace_dir, hlo = _write_inputs(tmp_path)
    out = _run(str(trace_dir), "--group", "--hlo", str(hlo))
    assert any(l.split("  ")[-1].strip() == "fusion" for l in out.splitlines())
    # grouped rows carry no (now-meaningless) HLO annotations
    assert "conv bf16" not in out

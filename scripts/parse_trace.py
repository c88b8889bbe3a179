#!/usr/bin/env python
"""Aggregate a jax.profiler device trace into a per-op time table.

Usage:
  python scripts/parse_trace.py <trace_dir_or_file> [--top 30] [--group]
      [--hlo step_hlo.txt]

Reads the newest `*.trace.json.gz` under the given directory (the layout
`jax.profiler.trace` writes: plugins/profile/<ts>/*.trace.json.gz), keeps
TensorCore op events, and prints total-duration-ranked rows. --group folds
XLA's numbered fusion suffixes (fusion.123 -> fusion) for a coarser view.

--hlo <file> joins each trace row against a compiled-HLO text dump (from
`jax.jit(f).lower(...).compile().as_text()`; the flagship step's dump is
one `BENCH_DUMP_HLO=/path python bench.py` away) and annotates fusions
with what they actually compute — the convolution shape/window when the
fusion wraps a conv (source_file metadata is useless here: every conv
routes through the shared ops/modulated_conv._conv helper), otherwise the
fusion's root op. This automates the shape/window identification workflow
behind the per-op roofline table in DESIGN.md §9.

Works without tensorboard; see memory: trust in-program traces over
tunnel-noisy microbenchmarks.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return cands[-1]


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name (TensorCore ops live on the device process)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    return events, pnames


def device_pids(pnames):
    pids = {pid for pid, name in pnames.items()
            if "TPU" in name or "/device" in name.lower()
            or "tensorcore" in name.lower()}
    return pids or set(pnames)


_DEF_RE = re.compile(r"^\s*(?:ROOT )?%([\w.-]+) = (\w+\[[\d,]*\]|\()")
_OPCODE_RE = re.compile(r"(\w+)\(%")  # first "op(%operand" on the line
_CALLS_RE = re.compile(r"calls=%([\w.-]+)")
_WINDOW_RE = re.compile(r"window=\{([^}]*)\}")


class HloIndex:
    """Joins trace op names against a compiled-HLO text dump: resolves a
    fusion to the convolution it wraps (shape/window) or to its root op."""

    def __init__(self, path: str):
        shapes = {}           # instruction name -> "bf16[16,256,256,64]"
        opline = {}           # instruction name -> full defining line
        comps = {}            # computation name -> [lines]
        cur = None
        with open(path) as f:
            for line in f:
                if line.startswith("%") and line.rstrip().endswith("{"):
                    cur = line.split()[0].lstrip("%")
                    comps[cur] = []
                elif line.startswith("}"):
                    cur = None
                elif cur is not None:
                    comps[cur].append(line)
                m = _DEF_RE.match(line)
                if m:
                    shape = "(tuple)" if m.group(2) == "(" else m.group(2)
                    shapes.setdefault(m.group(1), shape)
                    opline.setdefault(m.group(1), line)
        self.shapes, self.opline, self.comps = shapes, opline, comps

    def _conv_note(self, line: str):
        # drop layout annotations ("{3,0,2,1:T(8,128)(2,1)}") so the output
        # shape abuts "convolution("
        clean = re.sub(r"\{[\d,:a-zA-Z()# ]*\}", "", line, count=2)
        m = re.search(r"= (\w+\[[\d,]*\]) convolution\(%([\w.-]+), "
                      r"%([\w.-]+)\)", clean)
        if not m:
            return None
        out, lhs, rhs = m.groups()
        w = _WINDOW_RE.search(line)
        return (f"conv {self.shapes.get(lhs, '?')} * {self.shapes.get(rhs, '?')}"
                f" -> {out}" + (f"  window={{{w.group(1)}}}" if w else ""))

    def _collect_convs(self, comp: str, seen=None) -> list:
        """All convolution lines reachable from a fused computation,
        recursing through NESTED fusion instructions (the TPU backend nests
        whole convs inside other conv fusions' producers — a trace row can
        carry several convs' work)."""
        seen = seen if seen is not None else set()
        if comp in seen or comp not in self.comps:
            return []
        seen.add(comp)
        out = []
        for l in self.comps[comp]:
            if " convolution(" in l:
                out.append(l)
            else:
                m = _CALLS_RE.search(l)
                if m:
                    out.extend(self._collect_convs(m.group(1), seen))
        return out

    def annotate(self, name: str) -> str:
        line = self.opline.get(name)
        if line is None:
            return ""
        m = _CALLS_RE.search(line)
        if m and m.group(1) in self.comps:
            convs = self._collect_convs(m.group(1))
            if convs:
                notes = [self._conv_note(l) or "conv ?" for l in convs]
                return "  ++  ".join(notes)
            roots = [l for l in self.comps[m.group(1)] if " ROOT " in l
                     or l.lstrip().startswith("ROOT ")]
            if roots:
                mm = _OPCODE_RE.search(roots[-1])
                if mm:
                    return f"root={mm.group(1)} {self.shapes.get(name, '')}"
        mm = _OPCODE_RE.search(line)
        return f"{mm.group(1)} {self.shapes.get(name, '')}" if mm else ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true",
                    help="fold numeric suffixes (fusion.123 -> fusion)")
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by this step count (per-step ms)")
    ap.add_argument("--hlo", default=None,
                    help="compiled-HLO text dump to attribute fusions "
                         "against (see module docstring)")
    args = ap.parse_args()
    hlo = HloIndex(args.hlo) if args.hlo else None

    path = find_trace(args.path)
    print(f"# {path}", file=sys.stderr)
    events, pnames = load_events(path)
    pids = device_pids(pnames)

    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "")
        if args.group:
            name = re.sub(r"\.[0-9]+$", "", name)
        tot[name] += e.get("dur", 0)  # microseconds
        cnt[name] += 1
    grand = sum(tot.values())
    div = args.steps or 1
    print(f"{'total_ms':>10s} {'per_step':>9s} {'count':>7s} {'%':>6s}  name")
    for name, us in tot.most_common(args.top):
        note = hlo.annotate(name) if (hlo and not args.group) else ""
        print(f"{us / 1e3:10.2f} {us / 1e3 / div:9.3f} {cnt[name]:7d} "
              f"{100 * us / max(grand, 1):6.2f}  {name[:110]}"
              + (f"  |  {note}" if note else ""))
    print(f"{grand / 1e3:10.2f} {'':9s} {sum(cnt.values()):7d} {100.0:6.1f}  "
          f"TOTAL (device-op time)")


if __name__ == "__main__":
    main()

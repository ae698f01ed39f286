"""Device-trace profiler with source-line attribution.

Runs a jitted callable under jax.profiler, then joins the per-fusion device
durations with the optimized HLO's op_name/source metadata, printing cost
grouped by source file:line. Usage (as a library):

    from tools.trace_by_line import profile_by_line
    profile_by_line(jitted_fn_returning_arrays, lowered=jax.jit(f).lower(...))
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile

import jax


def _load_trace(tracedir: str):
    files = sorted(glob.glob(os.path.join(tracedir, "**/*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return tot, cnt


def _hlo_source_map(hlo_text: str):
    """fusion/op name -> 'file:line (op_kind)'."""
    src = {}
    pat = re.compile(
        r"^\s*%?([\w.\-]+) = \S+ ([\w\-]+)\(.*?"
        r'source_file="([^"]+)" source_line=(\d+)', re.M | re.S)
    for m in re.finditer(
        r"^\s*%?([\w.\-]+) = [^\n]*$", hlo_text, re.M
    ):
        line = m.group(0)
        name = m.group(1)
        sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        om = re.search(r'op_name="([^"]+)"', line)
        if sm:
            f = sm.group(1).replace("/root/repo/", "")
            op = om.group(1).split("/")[-1] if om else "?"
            src[name] = f"{f}:{sm.group(2)} ({op})"
    return src


def profile_by_line(run_fn, lowered=None, hlo_text: str | None = None,
                    top: int = 40, warmup: bool = True):
    """run_fn: zero-arg callable that executes & blocks. lowered: jax lowered
    object (for HLO metadata) or pass hlo_text directly."""
    if hlo_text is None and lowered is not None:
        hlo_text = lowered.compile().as_text()
    if warmup:
        run_fn()
    tracedir = tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(tracedir):
        run_fn()
    tot, cnt = _load_trace(tracedir)
    src = _hlo_source_map(hlo_text or "")

    by_line = collections.Counter()
    n_by_line = collections.Counter()
    total = 0
    for name, dur in tot.items():
        base = name.split("(")[0]
        if base.startswith("jit_") or base.startswith("while"):
            continue
        total += dur
        key = src.get(base, base if base in src else None)
        if key is None:
            # trace names may drop suffixes; try exact
            key = src.get(name, f"<unattributed: {base[:40]}>")
        by_line[key] += dur
        n_by_line[key] += cnt[name]
    print(f"total leaf device time: {total/1e3:.2f} ms")
    for key, dur in by_line.most_common(top):
        print(f"{dur/1e3:9.2f} ms x{n_by_line[key]:4d}  {key[:120]}")
    return by_line

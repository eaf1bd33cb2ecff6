"""Dev: bucket a step trace's device ops into named cost families.

Reads the newest .trace.json.gz under the given dir (default the
profile_step.py output) and attributes each leaf device op to a family by
its HLO name + output shape, printing per-step totals (K steps in program).
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

K = 8


def family(name: str, long_name: str) -> str:
    s = long_name or name
    if name.startswith(("while", "jit_", "0")):
        return "_wrapper"
    if "custom-call" in s or "pallas" in name or "jvp" in name:
        # pallas custom calls carry source lines in metadata; classify by shape
        if "68096,512" in s or "68096,256" in s:
            return "pallas lg-conv kernels (edge-space 68096)"
        if "7680,512" in s:
            return "pallas dkv segsum -> [7680,512]"
        if "7680,256" in s:
            return "pallas kernels -> [7680,256]"
        if "768," in s:
            return "pallas atom-conv kernels (node-space 768)"
        return "pallas other"
    if "68096" in s:
        return "xla lg edge-space [68096,*] streams"
    if "7680" in s:
        return "xla bond-space [7680,*] (epilogues/projections)"
    if "768," in s or ",768" in s:
        return "xla node-space [768,*]"
    if re.search(r"\b256,256\b", s) or "256]" in s:
        return "xla small (params/opt)"
    return "xla misc"


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnnep_prof_r5b"
    traces = sorted(glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pid_name = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device:" in n or "XLA" in n}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    sub = defaultdict(lambda: defaultdict(float))
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        a = ev.get("args") or {}
        long_name = str(a.get("long_name") or "")
        fam = family(name, long_name)
        dur = ev.get("dur", 0) / 1e3
        if fam == "_wrapper":
            continue
        agg[fam] += dur
        cnt[fam] += 1
        sub[fam][name] += dur
        total += dur
    print(f"leaf device time: {total:.2f} ms total, {total / K:.3f} ms/step\n")
    for fam, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{ms / K:8.3f} ms/step  x{cnt[fam]:<5d} {fam}")
        tops = sorted(sub[fam].items(), key=lambda kv: -kv[1])[:6]
        for n, m in tops:
            print(f"            {m / K:7.3f}  {n[:90]}")


if __name__ == "__main__":
    main()

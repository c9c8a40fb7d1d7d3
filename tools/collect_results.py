"""Collect the TPU measurement queue's logs (/tmp/q.*.log) into a compact
markdown summary for BASELINE.md.

Usage: python tools/collect_results.py [logdir_prefix]   (default /tmp/q)
Prints the summary to stdout; safe to run while the queue is mid-flight
(missing logs are skipped).
"""

import re
import sys
from pathlib import Path


def tail(path, n=40):
    try:
        lines = Path(path).read_text().splitlines()
    except OSError:
        return None
    return lines[-n:]


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/q"
    items = [
        ("bench", "bench.py (Cornell 1080p bf16 headline)"),
        ("incoh_46k", "incoherent A/B at 46.5k tris"),
        ("epilogue_ab", "chunk-epilogue A/B (reduce5 vs pack)"),
        ("large_46k", "large-scene standalone + in-frame at 46.5k"),
        ("incoh_2m", "incoherent A/B at 2M tris"),
        ("wf_tune", "wavefront hyperparameter sweep"),
        ("schedule_ab", "schedule-phase selection A/B (sort vs topk)"),
        ("viewer_fps", "viewer fps at 512x512"),
    ]
    prog = tail(f"{prefix}.progress", 100)
    if prog:
        print("## queue progress")
        for line in prog:
            print(f"    {line}")
        print()
    for name, desc in items:
        lines = tail(f"{prefix}.{name}.log")
        print(f"## {name} — {desc}")
        if lines is None:
            print("    (log missing — not run yet)\n")
            continue
        keep = [
            ln for ln in lines
            if re.search(
                r"Mrays|ms/frame|ms =|fps|agreement|PSNR|metric|FAILED|Error",
                ln,
            )
        ]
        for ln in keep or lines[-8:]:
            print(f"    {ln}")
        print()


if __name__ == "__main__":
    main()

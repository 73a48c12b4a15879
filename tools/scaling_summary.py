"""Write a SCALING_<tag>.txt block from two bench JSON lines (high/low
core count on the same SF dir): per-query low/high ratio vs the core
ratio — the instrument the round-10 verdict said was dead at sf0.1
because every query sat at the single-file + job-overhead floor.

Usage: python tools/scaling_summary.py <tag> <high.json> <low.json> <cpus_hi> <cpus_lo> <sf_label>
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    tag, hi_p, lo_p, c_hi, c_lo, sf = sys.argv[1:7]
    hi = json.load(open(hi_p))
    lo = json.load(open(lo_p))
    lines = [
        f"# SCALING_{tag}: bench at {sf}, {c_lo} vs {c_hi} cores "
        f"(core ratio {int(c_hi) / int(c_lo):.1f}x)",
        f"# calibration: {c_hi}c {hi['calibration_sec']}s load {hi['load_factor']}"
        f" | {c_lo}c {lo['calibration_sec']}s load {lo['load_factor']}",
        f"# totals: value {hi['value']} vs {lo['value']}"
        f" ({lo['value'] / hi['value']:.2f}x) | trimmed {hi['value_trimmed']}"
        f" vs {lo['value_trimmed']} ({lo['value_trimmed'] / hi['value_trimmed']:.2f}x)",
        "",
        f"{'query':28s} {c_hi + 'c':>8s} {c_lo + 'c':>8s} {'ratio':>7s}",
    ]
    for name, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(name)
        if t_lo is None or not t_hi:
            continue
        lines.append(f"{name:28s} {t_hi:8.3f} {t_lo:8.3f} {t_lo / t_hi:7.2f}")
    mf_hi, mf_lo = hi.get("queries_multifile"), lo.get("queries_multifile")
    if mf_hi and mf_lo:
        lines += ["", f"# multifile ({hi.get('multifile_n_files')} files) best-of"]
        for name, rec in mf_hi.items():
            r2 = mf_lo.get(name)
            if r2 and rec.get("best"):
                lines.append(
                    f"{name:28s} {rec['best']:8.3f} {r2['best']:8.3f} "
                    f"{r2['best'] / rec['best']:7.2f}"
                )
    out = f"/root/repo/SCALING_{tag}.txt"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Render the reference-scale study table from artifacts/refscale_67/.

Reads study_summary.json (target-domain test metrics per regime, written
by cli/domain_study.py after every leg) and prints the 10-row
teacher/student markdown table for RESULTS.md, with the student-carry
delta per adapted regime.

Usage: python scripts/refscale_summary.py [summary.json]
"""
import json
import sys

ORDER = ["baseline", "st", "hm", "cyclegan", "mme"]


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "artifacts/refscale_67/study_summary.json")
    with open(path) as f:
        s = json.load(f)

    print("| regime | teacher target IoU | student target IoU | carry |")
    print("|---|---|---|---|")
    for r in ORDER:
        t = s.get(r, {}).get("iou")
        st = s.get(f"student_{r}", {}).get("iou")
        t_s = f"{t:.1f}" if t is not None else "—"
        st_s = f"{st:.1f}" if st is not None else "—"
        d_s = f"{st - t:+.1f}" if (t is not None and st is not None) else "—"
        print(f"| {r} | {t_s} | {st_s} | {d_s} |")

    base = s.get("baseline", {}).get("iou")
    if base is not None:
        gains = {r: s[r]["iou"] - base for r in ORDER[1:] if r in s}
        if gains:
            print()
            print("adaptation gain over baseline (teacher): "
                  + ", ".join(f"{r} {g:+.1f}" for r, g in gains.items()))


if __name__ == "__main__":
    main()

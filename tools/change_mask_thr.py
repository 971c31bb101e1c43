#!/usr/bin/env python
"""Filter pseudo-label annotations by score threshold
(reference tools/change_mask_thr.py:6-41; the shipped pipeline uses 0.3,
scripts/generate_msrcnn_label.sh).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Filter pseudo labels by score")
    parser.add_argument("--input", required=True, help="msrcnn_pseudo_label.json")
    parser.add_argument("--output", default=None)
    parser.add_argument("--thr", type=float, default=0.3)
    args = parser.parse_args()

    with open(args.input) as f:
        data = json.load(f)

    before = len(data["annotations"])
    data["annotations"] = [
        a for a in data["annotations"] if a.get("score", 1.0) >= args.thr
    ]
    # the reference renumbers surviving ids densely from 1
    # (change_mask_thr.py:30-37) — downstream consumers may key on it
    for j, a in enumerate(data["annotations"], start=1):
        a["id"] = j
    # images with no surviving annotations stay (matches reference: only
    # annotations filtered)
    out = args.output or args.input.replace(
        ".json", f"_thr{args.thr:g}.json"
    )
    with open(out, "w") as f:
        json.dump(data, f)
    print(
        f"kept {len(data['annotations'])}/{before} annotations "
        f"(thr={args.thr}) -> {out}"
    )


if __name__ == "__main__":
    main()

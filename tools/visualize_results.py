#!/usr/bin/env python
"""Visualization CLI (reference visualize/vis_json_mmcv.py +
scripts/visual_result_mmcv.sh).

  python tools/visualize_results.py --result_file segm_results.json \
      --image_dir data/VOC2012/JPEGImages --save_dir vis/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cim_tpu.utils.visualize import visualize_result_file


def main():
    parser = argparse.ArgumentParser(description="Visualize result JSON")
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--num_classes", type=int, default=20)
    parser.add_argument("--score_thr", type=float, default=0.3)
    parser.add_argument("--max_images", type=int, default=None)
    args = parser.parse_args()
    n = visualize_result_file(
        args.result_file, args.image_dir, args.save_dir,
        num_classes=args.num_classes, score_thr=args.score_thr,
        max_images=args.max_images,
    )
    print(f"rendered {n} images -> {args.save_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate a synthetic ILSVRC2015-layout dataset for smoke testing.

Creates moving-box videos under the standard catalog paths
(Data/VID, Annotations/VID, ImageSets/VID_train_15frames.txt etc.) so the
real CLI tools run unmodified against --data-dir <out>.

Usage: python tools/make_synthetic_data.py --out /tmp/synth_vid \
           [--videos 4] [--frames 12] [--size 160 240]
"""

import argparse
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def write_xml(path, h, w, objs):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "width").text = str(w)
    for wnid, (x1, y1, x2, y2) in objs:
        o = ET.SubElement(root, "object")
        ET.SubElement(o, "name").text = wnid
        bb = ET.SubElement(o, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), (x1, y1, x2, y2)):
            ET.SubElement(bb, k).text = str(int(v))
    ET.ElementTree(root).write(path)


def main():
    import cv2
    from diffusionvid_tpu.data.vid_dataset import VID_WNIDS

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, nargs=2, default=(160, 240))
    ap.add_argument("--classes", type=int, default=30,
                    help="cycle classes mod this — small values give "
                         "several train videos per class with different "
                         "geometry, so color is the only stable class "
                         "cue and classification must generalize")
    args = ap.parse_args()

    h, w = args.size
    root = args.out
    img_root = os.path.join(root, "ILSVRC2015", "Data", "VID")
    anno_root = os.path.join(root, "ILSVRC2015", "Annotations", "VID")
    sets = os.path.join(root, "ILSVRC2015", "ImageSets")
    os.makedirs(sets, exist_ok=True)

    rng = np.random.RandomState(0)
    train_lines, val_lines = [], []
    for v in range(args.videos):
        split = "train" if v % 2 == 0 else "val"
        vdir = f"{split}/synth_{v:04d}"
        os.makedirs(os.path.join(img_root, vdir), exist_ok=True)
        os.makedirs(os.path.join(anno_root, vdir), exist_ok=True)
        # adjacent (train, val) video pairs share a class so the held-out
        # videos are classifiable at all — random classes left most val
        # classes unseen in training, capping any learnable AP
        cls = (v // 2) % args.classes + 1
        wnid = VID_WNIDS[cls]
        x, y = rng.randint(10, 60), rng.randint(10, 50)
        dx, dy = rng.randint(2, 6), rng.randint(1, 4)
        bw, bh = rng.randint(30, 60), rng.randint(25, 50)
        # class-keyed color: the class must be inferable from appearance
        # for held-out videos, or classification can never generalize
        # (with per-video random colors the label is visual noise).
        # Stride-7 hue wheel keeps adjacent class ids far apart in hue.
        import colorsys
        rr, gg, bb = colorsys.hsv_to_rgb((cls * 7 % 30) / 30.0, 0.85, 0.9)
        color = (int(bb * 255), int(gg * 255), int(rr * 255))   # cv2 BGR
        for f in range(args.frames):
            img = np.full((h, w, 3), 25, np.uint8)
            xx = min(x + dx * f, w - bw - 1)
            yy = min(y + dy * f, h - bh - 1)
            cv2.rectangle(img, (xx, yy), (xx + bw, yy + bh), color, -1)
            cv2.imwrite(os.path.join(img_root, vdir, f"{f:06d}.JPEG"), img)
            write_xml(os.path.join(anno_root, vdir, f"{f:06d}.xml"), h, w,
                      [(wnid, (xx, yy, xx + bw, yy + bh))])
            line = f"{vdir} 1 {f} {args.frames}"
            (train_lines if split == "train" else val_lines).append(line)

    with open(os.path.join(sets, "VID_train_15frames.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(sets, "VID_val_videos.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")
    print(f"synthetic dataset at {root}: {len(train_lines)} train / "
          f"{len(val_lines)} val frames")


if __name__ == "__main__":
    main()

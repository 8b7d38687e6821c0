"""Export an MP4 summary video from a predictions h5 (ref: summarizer/
summary.py:11-46): frames ``NNNNNN.jpg`` (1-based) whose machine_summary
bit is 1 are resized and written via cv2.  Pure host-side."""

from __future__ import annotations

import argparse
import os.path as osp

import h5py


def frm2video(frm_dir: str, summary, vid_writer, width: int, height: int):
    import cv2

    for idx, val in enumerate(summary):
        if val == 1:
            frm_path = osp.join(frm_dir, f"{idx + 1:06d}.jpg")
            frm = cv2.imread(frm_path)
            if frm is None:
                continue
            vid_writer.write(cv2.resize(frm, (width, height)))


def main(argv=None):
    p = argparse.ArgumentParser("Export a summary mp4")
    p.add_argument("-p", "--path", type=str, required=True, help="predictions h5")
    p.add_argument("-f", "--frames", type=str, required=True, help="frame directory")
    p.add_argument("-d", "--dataset", type=str, help="dataset h5 filename (group key)")
    p.add_argument("-v", "--video", type=str, help="video key")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    args = p.parse_args(argv)

    import cv2

    out_path = osp.join(osp.dirname(args.path), f"summary_{args.video}.mp4")
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (args.width, args.height)
    )
    with h5py.File(args.path, "r") as f:
        summary = f[args.dataset][args.video]["machine_summary"][...]
    frm2video(args.frames, summary, writer, args.width, args.height)
    writer.release()
    print(f"Summary saved at {out_path}")


if __name__ == "__main__":
    main()

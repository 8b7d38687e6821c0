"""Raw annotation loaders for SumMe/TVSum .mat files
(ref: summarizer/utils/io.py:38-68; loader shapes follow the
rethinking-evs conventions the reference credits)."""

from __future__ import annotations

import os


def load_summe_mat(dirname: str):
    """Per-video dicts from SumMe's GT .mat files (scipy.io)."""
    import scipy.io as sio

    videos = []
    for name in sorted(os.listdir(dirname)):
        if not name.endswith(".mat"):
            continue
        data = sio.loadmat(os.path.join(dirname, name))
        videos.append(
            {
                "video": name[:-4],
                "length": data["video_duration"],
                "nframes": data["nFrames"],
                "user_anno": data["user_score"],
                "gt_score": data["gt_score"],
            }
        )
    return videos


def load_tvsum_mat(path: str):
    """Per-video dicts from the tvsum50 struct (needs hdf5storage)."""
    try:
        import hdf5storage
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "load_tvsum_mat needs the optional 'hdf5storage' package"
        ) from e

    data = hdf5storage.loadmat(path, variable_names=["tvsum50"])
    data = data["tvsum50"].ravel()
    videos = []
    for item in data:
        video, category, title, length, nframes, user_anno, gt_score = item
        videos.append(
            {
                "video": video[0, 0],
                "category": category[0, 0],
                "title": title[0, 0],
                "length": length[0, 0],
                "nframes": nframes[0, 0],
                "user_anno": user_anno,
                "gt_score": gt_score,
            }
        )
    return videos

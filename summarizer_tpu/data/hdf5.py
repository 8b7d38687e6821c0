"""Readers for the ``summarizer_dataset_*.h5`` schema.

The data contract (per video group, datasets/README.md:5-42 in the reference):
  /features (n_steps, 1024) f32   GoogLeNet-pool5 of every 15th frame
  /gtscore (n_steps,)             importance target
  /gtsummary (n_steps,)           binary keyframe target
  /user_summary (n_users, n_frames)
  /user_scores (n_users, n_frames)
  /change_points (n_segs, 2)      KTS segments, inclusive bounds
  /n_frame_per_seg (n_segs,)
  /n_frames, /n_steps scalars; /picks (n_steps,); /video_name

Unlike the reference (which re-reads HDF5 per video per epoch inside the hot
loop, summarizer/models/logistic.py:68-70), everything needed for training
and evaluation is loaded once into host RAM and packed into padded device
arrays (data/batching.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import h5py
import numpy as np


@dataclass
class VideoRecord:
    key: str
    features: np.ndarray  # (n_steps, D) f32
    gtscore: np.ndarray  # (n_steps,) f32
    n_frames: int
    n_steps: int
    picks: np.ndarray  # (n_steps,) int32
    change_points: np.ndarray  # (n_segs, 2) int32
    n_frame_per_seg: np.ndarray  # (n_segs,) int32
    user_scores: np.ndarray | None = None  # (n_users, n_frames) f32
    user_summary: np.ndarray | None = None  # (n_users, n_frames) f32
    gtsummary: np.ndarray | None = None
    video_name: str = ""
    extras: dict = field(default_factory=dict)

    @property
    def normalized_gtscore(self) -> np.ndarray:
        """Per-video min-max normalized target, the supervised regression
        target of every trainer (e.g. summarizer/models/logistic.py:74-76)."""
        g = self.gtscore.astype(np.float32)
        lo, hi = g.min(), g.max()
        return (g - lo) / (hi - lo)  # NaN/inf on constant targets, as upstream


def _scalar(v) -> int:
    a = np.asarray(v)
    return int(a.reshape(-1)[0]) if a.size else 0


def dataset_short_name(path: str) -> str:
    """``summarizer_dataset_<name>_google_pool5.h5`` -> ``<name>`` (falls
    back to the file stem)."""
    import re

    base = os.path.basename(path)
    m = re.match(r"summarizer_dataset_(.+?)_google_pool5\.h5", base)
    return m.group(1) if m else os.path.splitext(base)[0]


class SummarizerDataset:
    """In-memory view of one or several dataset files, keyed by video name.

    With multiple files (augmented cross-dataset training pools — BASELINE
    config 3; absent from the reference, which binds one h5 per splits
    file), keys are dataset-qualified: ``<dataset>/<video_key>``.
    """

    def __init__(self, path: str | list[str], keys: list[str] | None = None):
        if isinstance(path, (list, tuple)):
            import dataclasses

            self.path = "+".join(dataset_short_name(p) for p in path)
            self.videos = {}
            for p in path:
                prefix = dataset_short_name(p)
                sub = SummarizerDataset(p)
                for k, v in sub.videos.items():
                    qk = f"{prefix}/{k}"
                    self.videos[qk] = dataclasses.replace(v, key=qk)
            return
        self.path = path
        self.videos: dict[str, VideoRecord] = {}
        with h5py.File(path, "r") as f:
            for key in keys if keys is not None else list(f.keys()):
                d = f[key]
                name = ""
                if "video_name" in d:
                    raw = d["video_name"][()]
                    name = raw.decode() if isinstance(raw, bytes) else str(raw)
                self.videos[key] = VideoRecord(
                    key=key,
                    features=np.asarray(d["features"][...], dtype=np.float32),
                    gtscore=np.asarray(d["gtscore"][...], dtype=np.float32),
                    n_frames=_scalar(d["n_frames"][()]),
                    n_steps=_scalar(d["n_steps"][()]) if "n_steps" in d else len(d["picks"]),
                    picks=np.asarray(d["picks"][...], dtype=np.int32),
                    change_points=np.asarray(d["change_points"][...], dtype=np.int32),
                    n_frame_per_seg=np.asarray(d["n_frame_per_seg"][...], dtype=np.int32),
                    user_scores=(
                        np.asarray(d["user_scores"][...], dtype=np.float32)
                        if "user_scores" in d
                        else None
                    ),
                    user_summary=(
                        np.asarray(d["user_summary"][...], dtype=np.float32)
                        if "user_summary" in d
                        else None
                    ),
                    gtsummary=(
                        np.asarray(d["gtsummary"][...], dtype=np.float32)
                        if "gtsummary" in d
                        else None
                    ),
                    video_name=name,
                )

    def keys(self) -> list[str]:
        return list(self.videos.keys())

    def __getitem__(self, key: str) -> VideoRecord:
        return self.videos[key]

    def __len__(self) -> int:
        return len(self.videos)

    def subset(self, keys) -> list[VideoRecord]:
        missing = [k for k in keys if k not in self.videos]
        if missing:
            raise KeyError(f"Videos not in {self.path}: {missing}")
        return [self.videos[k] for k in keys]

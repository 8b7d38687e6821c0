"""Raw frames -> schema-compatible feature h5 (end-to-end raw-video path).

Pipeline: read frames (``NNNNNN.jpg`` dirs from scripts/videos2frames.sh or
an mp4 via cv2), subsample every 15th frame (datasets/README.md:46), batch
through the on-TPU GoogLeNet tower, and write a ``summarizer_dataset``-style
h5 (features/picks/n_frames/n_steps + uniform 2-second segments, the LOL
fallback the reference used when KTS was intractable, Summarizer.pdf §2.2).
"""

from __future__ import annotations

import os

import h5py
import numpy as np

from summarizer_tpu.features.googlenet import googlenet_apply

SUBSAMPLE = 15
IMAGE_SIZE = 224


def iter_video_frames(path_or_dir: str, every: int = SUBSAMPLE):
    """Yield (frame_index, HxWx3 uint8 RGB) for every ``every``-th frame."""
    import cv2

    if os.path.isdir(path_or_dir):
        names = sorted(n for n in os.listdir(path_or_dir) if n.endswith(".jpg"))
        for i, name in enumerate(names):
            if i % every == 0:
                bgr = cv2.imread(os.path.join(path_or_dir, name))
                if bgr is not None:
                    yield i, cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        return
    cap = cv2.VideoCapture(path_or_dir)
    i = 0
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        if i % every == 0:
            yield i, cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()


def count_frames(path_or_dir: str) -> int:
    """True total frame count (the subsample loop only sees every 15th, so
    the last *picked* index understates n_frames by up to 14 — enough to
    clip the final summary segment)."""
    import cv2

    if os.path.isdir(path_or_dir):
        return sum(1 for n in os.listdir(path_or_dir) if n.endswith(".jpg"))
    cap = cv2.VideoCapture(path_or_dir)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    cap.release()
    return n


def _preprocess(frames: list[np.ndarray]) -> np.ndarray:
    import cv2

    out = np.zeros((len(frames), IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
    for i, f in enumerate(frames):
        out[i] = cv2.resize(f, (IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32) / 255.0
    return out


def extract_features(
    params,
    path_or_dir: str,
    batch: int = 32,
    fps: float = 30.0,
    segmentation: str = "uniform",
    max_segments: int | None = None,
):
    """Returns a dict with the per-video schema fields for one video.

    ``segmentation``: "uniform" reproduces the reference's 2-second fallback
    (Summarizer.pdf §2.2); "kts" runs the on-device KTS DP (ops/kts.py) over
    the extracted features — the step the reference found intractable on CPU.
    """
    import jax

    fwd = jax.jit(googlenet_apply)
    feats, picks = [], []
    buf, buf_idx = [], []
    n_frames = 0

    def flush():
        if not buf:
            return
        x = _preprocess(buf)
        feats.append(np.asarray(fwd(params, x)))
        picks.extend(buf_idx)
        buf.clear()
        buf_idx.clear()

    for idx, frame in iter_video_frames(path_or_dir):
        buf.append(frame)
        buf_idx.append(idx)
        n_frames = idx + 1
        if len(buf) == batch:
            flush()
    flush()
    # cv2's frame-count property can be unreliable (0) for some containers;
    # the last decoded index is the floor in that case.
    n_frames = max(n_frames, count_frames(path_or_dir))

    features = (
        np.concatenate(feats, axis=0) if feats else np.zeros((0, 1024), np.float32)
    )
    picks = np.asarray(picks, np.int32)
    n_steps = len(picks)

    if segmentation == "kts" and n_steps > 1:
        from summarizer_tpu.ops.kts import kts_segment

        m_max = max_segments or max(2, n_steps // 10)
        step_cps = kts_segment(features, m_max)
        # feature-step bounds -> frame bounds via picks; last segment ends at
        # the final frame.
        starts = picks[step_cps[:, 0]]
        ends = np.concatenate([starts[1:] - 1, [max(n_frames, 1) - 1]])
        cps = np.stack([starts, ends], axis=1).astype(np.int32)
    else:
        # Uniform 2-second segmentation (the reference's KTS fallback for
        # long videos, Summarizer.pdf §2.2).
        seg_len = max(int(round(2.0 * fps)), 1)
        starts = np.arange(0, max(n_frames, 1), seg_len)
        ends = np.minimum(starts + seg_len - 1, max(n_frames, 1) - 1)
        cps = np.stack([starts, ends], axis=1).astype(np.int32)

    return dict(
        features=features.astype(np.float32),
        picks=picks,
        n_frames=n_frames,
        n_steps=n_steps,
        change_points=cps,
        n_frame_per_seg=(ends - starts + 1).astype(np.int32),
    )


def write_features_h5(out_path: str, videos: dict[str, dict]):
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with h5py.File(out_path, "w") as f:
        for key, v in videos.items():
            g = f.create_group(key)
            for name, arr in v.items():
                g.create_dataset(name, data=arr)

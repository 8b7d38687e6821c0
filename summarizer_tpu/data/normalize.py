"""Upstream -> summarizer dataset schema conversion
(ref: summarizer/datasets/normalize_datasets.py:15-62).

TVSum: the eccv16 h5 gains ``/video_name`` (from the tvsum50 info TSV) and
``/user_scores`` = (user_anno - 1) / 4 from the original .mat annotations.
SumMe: gains ``/user_scores`` = the upsampled gtscore as one pseudo-user.
"""

from __future__ import annotations

import shutil

import h5py
import numpy as np

from summarizer_tpu.ops.eval_np import upsample


def normalize_tvsum(
    eccv_h5: str,
    out_h5: str,
    tvsum_mat: str,
    info_tsv: str,
):
    import pandas as pd

    from summarizer_tpu.data.io_mat import load_tvsum_mat

    info = pd.read_table(info_tsv).reset_index()
    info["index"] = info["index"].apply(lambda x: f"video_{x + 1}")
    data = load_tvsum_mat(tvsum_mat)
    user_scores = {
        f"video_{i + 1}": (v["user_anno"].T - 1.0) / 4.0 for i, v in enumerate(data)
    }

    shutil.copyfile(eccv_h5, out_h5)
    with h5py.File(out_h5, "r+") as f:
        for key in f.keys():
            name = info[info["index"] == key]["video_id"]
            f[key].create_dataset(
                "video_name",
                dtype=h5py.string_dtype(encoding="utf-8"),
                data=(name.iloc[0] if len(name) else key),
            )
            f[key].create_dataset("user_scores", data=user_scores[key])


def normalize_summe(eccv_h5: str, out_h5: str):
    shutil.copyfile(eccv_h5, out_h5)
    with h5py.File(out_h5, "r+") as f:
        for key in f.keys():
            us = upsample(
                f[key]["gtscore"][...],
                int(np.asarray(f[key]["n_frames"][()]).reshape(-1)[0]),
                f[key]["picks"][...],
            )[None, :]
            f[key].create_dataset("user_scores", data=us)

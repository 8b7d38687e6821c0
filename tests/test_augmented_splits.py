"""Augmented cross-dataset splits: multi-h5 view + end-to-end training."""

import h5py
import numpy as np
import pytest

from summarizer_tpu.data.hdf5 import SummarizerDataset, dataset_short_name
from summarizer_tpu.data.splits import make_augmented_splits, write_splits
from summarizer_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def two_datasets(tmp_path_factory):
    root = tmp_path_factory.mktemp("aug")
    a = write_synthetic_dataset(
        str(root / "summarizer_dataset_alpha_google_pool5.h5"),
        n_videos=4, seed=1, min_steps=24, max_steps=40, feature_dim=64, n_users=2,
    )
    b = write_synthetic_dataset(
        str(root / "summarizer_dataset_beta_google_pool5.h5"),
        n_videos=5, seed=2, min_steps=24, max_steps=40, feature_dim=64, n_users=2,
    )
    return a, b


def test_short_name():
    assert dataset_short_name("x/summarizer_dataset_tvsum_google_pool5.h5") == "tvsum"
    assert dataset_short_name("foo.h5") == "foo"


def test_multi_dataset_view(two_datasets):
    a, b = two_datasets
    ds = SummarizerDataset([a, b])
    assert len(ds) == 9
    assert all("/" in k for k in ds.keys())
    r = ds["alpha/video_1"]
    assert r.features.shape[1] == 64


def test_augmented_training_end_to_end(two_datasets, tmp_path):
    a, b = two_datasets
    from summarizer_tpu.train.loop import train
    from summarizer_tpu.utils.config import HParameters

    with h5py.File(b) as f:
        target_keys = [f"beta/{k}" for k in f.keys()]
    with h5py.File(a) as f:
        other_keys = [f"alpha/{k}" for k in f.keys()]
    splits = make_augmented_splits(target_keys, other_keys, num_splits=2, seed=0)
    assert all(len(s["train_keys"]) == len(other_keys) + 4 for s in splits)
    assert all(k.startswith("beta/") for s in splits for k in s["test_keys"])
    sp = str(tmp_path / "beta_aug_splits.json")
    write_splits(splits, sp)

    hps = HParameters().load_from_args({
        "model": "logistic",
        "datasets": f"{a},{b}",
        "splits_files": sp,
        "epochs": 2,
        "log_dir": str(tmp_path / "logs"),
        "tensorboard": False,
        "log_level": "warning",
        "extra_params": {"input_size": 64},
    })
    assert isinstance(hps.dataset_of_file[sp], list)
    results = train(hps)
    assert np.isfinite(results[0][1])
    # qualified keys become nested h5 groups in the preds file
    with h5py.File(hps.pred_path[sp]) as f:
        top = f[list(f.keys())[0]]
        assert "alpha" in top and "beta" in top
        assert "machine_summary" in top["beta"][list(top["beta"].keys())[0]]

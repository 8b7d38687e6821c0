"""Cross-validation split files.

Same JSON contract as the reference: a list of ``{"train_keys": [...],
"test_keys": [...]}`` folds, with the dataset name taken from the filename
prefix (summarizer/utils/__init__.py:4-17; create_split.py:30-41).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np


def parse_splits_filename(splits_filename: str):
    """(dataset_name, folds) from a ``<dataset>_*.json`` split file."""
    base = os.path.splitext(os.path.basename(splits_filename))[0]
    dataset_name = base.split("_")[0]
    with open(splits_filename) as f:
        splits = json.load(f)
    return dataset_name, splits


def make_random_splits(
    keys: list[str],
    num_splits: int = 5,
    train_percent: float = 0.8,
    seed: int | None = None,
):
    """Random folds: ceil(train_percent * N) train keys per fold, disjoint
    train/test within a fold (ref: create_split.py:30-41, 56-66)."""
    keys = list(keys)
    n = len(keys)
    n_train = int(math.ceil(n * train_percent))
    rng = np.random.RandomState(seed)
    splits = []
    for _ in range(num_splits):
        chosen = set(rng.choice(n, size=n_train, replace=False).tolist())
        train = [k for i, k in enumerate(keys) if i in chosen]
        test = [k for i, k in enumerate(keys) if i not in chosen]
        assert not (set(train) & set(test)), "train/test overlap"
        splits.append({"train_keys": train, "test_keys": test})
    return splits


def make_augmented_splits(
    target_keys: list[str],
    other_keys: list[str],
    num_splits: int = 5,
    train_percent: float = 0.8,
    seed: int | None = None,
):
    """Augmented cross-dataset folds (the vsumm literature's "aug" setting;
    BASELINE config 3): every fold trains on ALL other datasets' videos plus
    ``train_percent`` of the target dataset, and tests on the target's
    held-out remainder.  Keys must be dataset-qualified ("<dataset>/<key>")."""
    folds = make_random_splits(target_keys, num_splits, train_percent, seed)
    return [
        {
            "train_keys": list(other_keys) + f["train_keys"],
            "test_keys": f["test_keys"],
        }
        for f in folds
    ]


def write_splits(splits, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(splits, f, indent=4, separators=(",", ": "))

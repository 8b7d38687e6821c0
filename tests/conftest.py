"""Test harness: force a virtual 8-device CPU mesh before JAX initializes.

All tests run TPU-shaped code on CPU (SURVEY.md §4: multi-device paths must
be testable without a TPU); the real chip is exercised by bench.py.
"""

import os

# The image's sitecustomize force-registers a TPU PJRT plugin at interpreter
# startup (before pytest loads conftest), so env vars alone cannot win; pin
# the platform through jax.config before any backend is initialized.  Without
# this, "CPU" tests silently run on the TPU with bf16 MXU matmuls and the
# torch-parity tolerances fail.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests get their own compile cache: the repo-level .jax_cache is shared
# with TPU-attached runs whose host-side (XLA:CPU AOT) artifacts are
# compiled on the REMOTE worker's CPU — loading those here triggers
# machine-feature-mismatch warnings and risks SIGILL on older hosts.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu_tests")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from summarizer_tpu.data.synthetic import synth_video  # noqa: E402


@pytest.fixture(scope="session")
def synth_records():
    """A handful of schema-complete synthetic videos as VideoRecords."""
    from summarizer_tpu.data.hdf5 import VideoRecord

    rng = np.random.RandomState(7)
    records = []
    for i, n_steps in enumerate([37, 64, 51, 80]):
        v = synth_video(rng, n_steps, feature_dim=64, n_users=4)
        records.append(
            VideoRecord(
                key=f"video_{i + 1}",
                features=v["features"],
                gtscore=v["gtscore"],
                n_frames=int(v["n_frames"]),
                n_steps=int(v["n_steps"]),
                picks=v["picks"],
                change_points=v["change_points"],
                n_frame_per_seg=v["n_frame_per_seg"],
                user_scores=v["user_scores"],
                user_summary=v["user_summary"],
                gtsummary=v["gtsummary"],
            )
        )
    return records


@pytest.fixture(scope="session")
def synth_h5(tmp_path_factory):
    from summarizer_tpu.data.synthetic import write_synthetic_dataset

    path = tmp_path_factory.mktemp("data") / "summarizer_dataset_synthetic_google_pool5.h5"
    return write_synthetic_dataset(
        str(path), n_videos=6, seed=3, min_steps=30, max_steps=70, feature_dim=64, n_users=3
    )

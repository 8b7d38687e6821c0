"""Full-network GoogLeNet parity vs an in-test torch replica.

Real ImageNet weights need one torchvision download (absent here), so the
strongest offline certification is architectural: a torch replica of
torchvision's ``googlenet`` tower (BasicConv2d = conv + BN(eps=1e-3) + ReLU,
3x3 convs in the "5x5" branch, ceil_mode pools) is loaded with the SAME
fabricated state_dict the export script writes, and the pool5 descriptors
must match.  Once `scripts/export_googlenet_weights.py` runs with egress,
the numbers are real by construction — every op after the weight file is
pinned here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from summarizer_tpu.features.googlenet import (  # noqa: E402
    _INCEPTION,
    fabricate_state_dict,
    googlenet_apply,
    load_torch_state_dict,
)


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class Inception(nn.Module):
    def __init__(self, cin, b1, b2r, b2, b3r, b3, b4):
        super().__init__()
        self.branch1 = BasicConv2d(cin, b1, 1)
        self.branch2 = nn.Sequential(BasicConv2d(cin, b2r, 1),
                                     BasicConv2d(b2r, b2, 3, padding=1))
        self.branch3 = nn.Sequential(BasicConv2d(cin, b3r, 1),
                                     BasicConv2d(b3r, b3, 3, padding=1))
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(cin, b4, 1),
        )

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x), self.branch3(x),
                          self.branch4(x)], dim=1)


class TorchGoogLeNetTower(nn.Module):
    """torchvision.models.googlenet minus aux heads / fc / transform_input:
    exactly the pool5 tower the extractor reproduces."""

    def __init__(self):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, 7, stride=2, padding=3)
        self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, 1)
        self.conv3 = BasicConv2d(64, 192, 3, padding=1)
        self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        for name, spec in _INCEPTION.items():
            setattr(self, f"inception{name}", Inception(*spec))
        self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        x = self.inception3b(self.inception3a(x))
        x = self.maxpool3(x)
        for n in ("4a", "4b", "4c", "4d", "4e"):
            x = getattr(self, f"inception{n}")(x)
        x = self.maxpool4(x)
        x = self.inception5b(self.inception5a(x))
        return x.mean(dim=(2, 3))  # adaptive avg pool to 1x1


def test_extract_pipeline_end_to_end(tmp_path):
    """Raw frames dir -> extract_features -> schema h5: 15x subsampling
    picks, segment bookkeeping, and the feature matrix shape (the raw-video
    path replacing the reference's precomputed downloads,
    summarizer/datasets/README.md:46)."""
    cv2 = pytest.importorskip("cv2")

    from summarizer_tpu.features.extract import extract_features, write_features_h5
    from summarizer_tpu.features.googlenet import googlenet_init

    import jax

    frames_dir = tmp_path / "video1"
    frames_dir.mkdir()
    rng = np.random.RandomState(9)
    n_frames = 40
    for i in range(n_frames):
        img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(frames_dir / f"{i + 1:06d}.jpg"), img)

    params = googlenet_init(jax.random.PRNGKey(0))
    v = extract_features(params, str(frames_dir), batch=2, fps=10.0)

    assert list(v["picks"]) == [0, 15, 30]
    assert v["n_steps"] == 3
    assert v["features"].shape == (3, 1024)
    assert np.all(np.isfinite(v["features"]))
    assert v["n_frames"] == n_frames
    # segments tile [0, n_frames) contiguously
    cps = v["change_points"]
    assert cps[0, 0] == 0 and cps[-1, 1] == n_frames - 1
    assert np.all(cps[1:, 0] == cps[:-1, 1] + 1)
    assert v["n_frame_per_seg"].sum() == n_frames

    out = str(tmp_path / "feats.h5")
    write_features_h5(out, {"video_1": v})
    import h5py

    with h5py.File(out, "r") as f:
        assert f["video_1/features"].shape == (3, 1024)
        assert list(f["video_1/picks"][()]) == [0, 15, 30]


def test_googlenet_pool5_matches_torch_replica():
    sd = fabricate_state_dict(seed=5)
    m = TorchGoogLeNetTower()
    missing, unexpected = m.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # Only BN bookkeeping (num_batches_tracked) may be missing; every
    # weight/BN statistic key in the export format must land somewhere.
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    m.eval()

    params = load_torch_state_dict(sd)

    rng = np.random.RandomState(6)
    x01 = rng.rand(2, 224, 224, 3).astype(np.float32)  # our ABI: [0,1] NHWC
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    normed = (x01 - mean) / std  # what the tower actually consumes

    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(normed, (0, 3, 1, 2)))).numpy()
    got = np.asarray(googlenet_apply(params, jnp.asarray(x01)))

    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)

"""Export torchvision GoogLeNet ImageNet weights to a portable .npz.

Run this ONCE on any machine with torchvision + network access:

    pip install torchvision
    python scripts/export_googlenet_weights.py googlenet_imagenet.npz

then drop the npz next to the datasets (or pass --weights to
`python -m summarizer_tpu.cli.extract`).  The TPU side never needs torch:
`summarizer_tpu.features.googlenet.load_npz` reads this file directly.

The npz holds the raw torchvision state_dict arrays under their original
key names (BN unfused — folding happens at load time, features/googlenet.py
:_fold_bn), so the file is also usable by torch code and easy to verify:

    sha of each array == sha of googlenet-1378be20.pth contents.

Offline validation (no torchvision needed): --selftest exports a fabricated
state_dict in the exact torchvision key layout and round-trips it through
load_npz + googlenet_apply; tests/test_googlenet.py exercises the same path.
"""

import sys

import numpy as np


def export_from_torchvision(out_path: str) -> None:
    from torchvision.models import GoogLeNet_Weights, googlenet

    model = googlenet(weights=GoogLeNet_Weights.IMAGENET1K_V1)
    sd = model.state_dict()
    arrays = {
        k: v.detach().cpu().numpy()
        for k, v in sd.items()
        if not k.startswith("aux") and not k.startswith("fc")
    }
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}: {len(arrays)} arrays")


def main(argv):
    if "--selftest" in argv:
        sys.path.insert(0, ".")
        from summarizer_tpu.features.googlenet import (
            fabricate_state_dict,
            googlenet_apply,
            load_npz,
        )

        sd = fabricate_state_dict(seed=0)
        np.savez_compressed("/tmp/googlenet_selftest.npz", **sd)
        params = load_npz("/tmp/googlenet_selftest.npz")
        x = np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32)
        feats = googlenet_apply(params, x)
        assert feats.shape == (1, 1024), feats.shape
        print("selftest OK: export format -> load_npz -> pool5", feats.shape)
        return
    out = argv[1] if len(argv) > 1 else "googlenet_imagenet.npz"
    export_from_torchvision(out)


if __name__ == "__main__":
    main(sys.argv)

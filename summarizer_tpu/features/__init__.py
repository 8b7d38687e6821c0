"""On-TPU CNN feature extraction (new capability, BASELINE.json config 5).

The reference consumes *precomputed* GoogLeNet-pool5 features
(datasets/README.md:46) and has no extraction path of its own.  This package
removes the precompute dependency: an Inception-v1 (GoogLeNet) tower in JAX
runs on-device over raw frames and emits schema-compatible feature h5 files.
"""

from summarizer_tpu.features.googlenet import (  # noqa: F401
    googlenet_init,
    googlenet_apply,
    load_torch_state_dict,
)

"""The known-fatal (group, padded T) shape guard (QUIRKS.md worker abort;
VERDICT r3 item 6): the bisected constraint is encoded as a padding rule so
a future fixture regeneration or bucket change can't silently re-land the
SumGAN 3-phase program on (20, 648)."""

import h5py
import numpy as np

from summarizer_tpu.train.shape_guard import guard_padded_t, is_fatal


def test_fatal_shape_detected():
    assert is_fatal("sumgan_3phase", 20, 648)
    assert is_fatal("sumgan_3phase", 24, 648)  # larger group, same program
    assert not is_fatal("sumgan_3phase", 16, 648)  # bisected safe
    assert not is_fatal("sumgan_3phase", 20, 640)  # TVSum shape runs
    assert not is_fatal("sumgan_att", 20, 648)  # different program
    assert not is_fatal("sumgan_3phase", 20, 656)


def test_guard_nudges_padding():
    assert guard_padded_t("sumgan_3phase", 20, 648) == 656
    assert guard_padded_t("sumgan_3phase", 10, 648) == 648
    assert guard_padded_t("sumgan_3phase", 20, 640) == 640
    assert guard_padded_t(None, 20, 648) == 648  # untagged engines


def test_sumgan_engine_applies_guard(tmp_path):
    """A dataset whose longest video pads to exactly 648 steps (the SumMe
    fixture's shape) must give a SumGAN engine at group 20 a nudged t_max —
    and leave group 10 (the sweep's summe override) untouched."""
    from summarizer_tpu.data.synthetic import write_synthetic_dataset
    from summarizer_tpu.data.hdf5 import SummarizerDataset
    from summarizer_tpu.models import get_model
    from summarizer_tpu.train.adversarial import SumGANEngine

    path = str(tmp_path / "d.h5")
    write_synthetic_dataset(path, n_videos=2, min_steps=641, max_steps=641,
                            feature_dim=8)

    class _Log:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    class _Hps:
        batch_size = 20
        summary_proportion = 0.15
        seq_parallel = 0
        extra_params = {"batch_size": 20, "input_size": 8}
        logger = _Log()
        writer = None

    ds = SummarizerDataset(path)
    spec = get_model("sumgan")
    eng = SumGANEngine(spec, _Hps(), ds, "d")
    assert eng.t_max == 656  # 648 is fatal at group 20

    hps10 = _Hps()
    hps10.extra_params = {"batch_size": 10, "input_size": 8}
    eng10 = SumGANEngine(spec, hps10, ds, "d")
    assert eng10.t_max == 648

"""Host data layer: HDF5 schema readers, split files, padded device batches."""

from summarizer_tpu.data.hdf5 import VideoRecord, SummarizerDataset  # noqa: F401
from summarizer_tpu.data.splits import parse_splits_filename, make_random_splits  # noqa: F401
from summarizer_tpu.data.batching import (  # noqa: F401
    TrainPack,
    pack_train,
    pack_eval,
    eval_static_dims,
)

"""Data pipeline: CSV datasets, vocab, host loader, synthetic data."""

from zsgnet_tpu.data.dataset import ImgQuDataset, get_data, DataWrap  # noqa: F401
from zsgnet_tpu.data.vocab import Vocab  # noqa: F401

from .npz_dataset import SliceDataset, BatchLoader, load_npz_slice
from .splits import read_fold_split, read_test_split
from . import synthetic

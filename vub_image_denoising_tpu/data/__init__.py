from .datasets import FolderPatchDataset, SIDDPatchDataset, ArrayPatchDataset
from .device import degrade_and_normalize, augment_pair, normalize_pair, denormalize
from .loader import PatchLoader, load_data, load_sidd_data

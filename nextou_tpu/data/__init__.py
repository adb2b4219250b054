from nextou_tpu.data.dataset import PreprocessedDataset, save_case, make_splits
from nextou_tpu.data.sampler import PatchSampler
from nextou_tpu.data.augment import AugmentConfig, augment_batch
from nextou_tpu.data.loader import PatchDataLoader
from nextou_tpu.data.synthetic import make_synthetic_dataset

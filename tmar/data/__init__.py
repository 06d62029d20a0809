from tmar.data.transforms import normalize01_to_pm1, hu_window, random_crop_pair, random_flip_pair
from tmar.data.synthetic import SyntheticMARDataset
from tmar.data.syndeeplesion import SynDeepLesionTrainDataset, SynDeepLesionValDataset, SynDeepLesionTestDataset
from tmar.data.spineweb import SpineWebDataset
from tmar.data.spineweb_selfsup import SpineWebSelfSupervisedDataset
from tmar.data.finetune import BenchmarkFinetuneDataset
from tmar.data.loader import Loader
from tmar.data.shard_cache import ShardCachedDataset, build_shard_cache, cache_syndeeplesion

__all__ = [
    "normalize01_to_pm1",
    "hu_window",
    "random_crop_pair",
    "random_flip_pair",
    "SyntheticMARDataset",
    "SynDeepLesionTrainDataset",
    "SynDeepLesionValDataset",
    "SynDeepLesionTestDataset",
    "SpineWebDataset",
    "SpineWebSelfSupervisedDataset",
    "BenchmarkFinetuneDataset",
    "Loader",
    "ShardCachedDataset",
    "build_shard_cache",
    "cache_syndeeplesion",
]

from agcn_tpu.data import transforms
from agcn_tpu.data.feeder import JOINT_MAPPING, SGNDataset, SkeletonDataset
from agcn_tpu.data.pipeline import BatchIterator, make_sgn_collate
from agcn_tpu.data.sgn_collate import SegmentSampler

__all__ = ["transforms", "JOINT_MAPPING", "SGNDataset", "SkeletonDataset",
           "BatchIterator", "make_sgn_collate", "SegmentSampler"]

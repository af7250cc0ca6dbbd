from agcn_tpu.data.gen.preprocess import pre_normalization
from agcn_tpu.data.gen.rotation import (align_rotation, angle_between,
                                        rotation_matrix)
from agcn_tpu.data.gen.streams import (bone_stream, generate_streams,
                                       merge_joint_bone, motion_stream)

__all__ = ["pre_normalization", "align_rotation", "angle_between",
           "rotation_matrix", "bone_stream", "generate_streams",
           "merge_joint_bone", "motion_stream"]

from agcn_tpu.graph.skeletons import (
    KINETICS_18,
    NTU_RGBD_25,
    OPENPOSE_B25_J15,
    Skeleton,
    available_skeletons,
    get_skeleton,
)
from agcn_tpu.graph.build import (
    EdgeSet,
    binary_adjacency,
    build_adjacency,
    dense_to_edges,
    edge2mat,
    k_adjacency,
    normalize_in_degree,
    normalize_symmetric,
    spatial_edge_sets,
    spatial_graph,
)

__all__ = [
    "KINETICS_18", "NTU_RGBD_25", "OPENPOSE_B25_J15", "Skeleton",
    "available_skeletons", "get_skeleton", "EdgeSet", "binary_adjacency",
    "build_adjacency", "dense_to_edges", "edge2mat", "k_adjacency",
    "normalize_in_degree", "normalize_symmetric", "spatial_edge_sets",
    "spatial_graph",
]

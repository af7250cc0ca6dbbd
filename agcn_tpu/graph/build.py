"""Adjacency construction and normalization.

Dense construction with functional parity against reference graph/tools.py
(edge2mat :4-8, normalize_digraph :11-19, get_spatial_graph :22-27,
normalize_adjacency_matrix :130-134, k_adjacency :97-106), plus partitionable
COO edge structures for the multi-host edge-partitioned aggregation path.

Dense (K, V, V) is the primary representation: V <= 25, so the adjacency
lives permanently in VMEM and aggregation is a dense matmul on the MXU —
the speed-of-light layout for skeleton graphs. The COO form exists for the
distributed edge-partition path and for tooling (visualization, analysis).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Tuple

import numpy as np

from agcn_tpu.graph.skeletons import Edge, Skeleton, get_skeleton


def edge2mat(edges: Iterable[Edge], num_joints: int) -> np.ndarray:
    """Directed adjacency: A[target, source] = 1 for each (source, target).

    Matches reference graph/tools.py:4-8 (A[j, i] = 1 for (i, j) in link):
    column index is the message source, row index the destination.
    """
    a = np.zeros((num_joints, num_joints), dtype=np.float64)
    for src, dst in edges:
        a[dst, src] = 1.0
    return a


def normalize_in_degree(a: np.ndarray) -> np.ndarray:
    """Column-normalize: A @ D^-1 with D the column-sum (in-degree) diagonal.

    Parity: reference graph/tools.py:11-19.
    """
    deg = a.sum(axis=0)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    return a * inv[None, :]


def normalize_symmetric(a: np.ndarray) -> np.ndarray:
    """D^-1/2 A D^-1/2 with row-sum degrees (reference graph/tools.py:130-134)."""
    deg = a.sum(axis=-1)
    inv_sqrt = np.power(np.maximum(deg, 1e-12), -0.5)
    inv_sqrt = np.where(deg > 0, inv_sqrt, 0.0)
    return (inv_sqrt[:, None] * a * inv_sqrt[None, :]).astype(np.float64)


def spatial_graph(skeleton: Skeleton) -> np.ndarray:
    """3-subset spatial partition stack (I, norm-inward, norm-outward).

    Returns float32 (3, V, V). Parity: reference graph/tools.py:22-27 via
    graph/ntu_rgb_d.py:23-30 ('spatial' labeling mode).
    """
    v = skeleton.num_joints
    identity = edge2mat(skeleton.self_loops, v)
    inward = normalize_in_degree(edge2mat(skeleton.inward, v))
    outward = normalize_in_degree(edge2mat(skeleton.outward, v))
    return np.stack([identity, inward, outward]).astype(np.float32)


def binary_adjacency(skeleton: Skeleton, with_self: bool = True) -> np.ndarray:
    """Symmetric binary adjacency, optionally with self loops."""
    v = skeleton.num_joints
    edges = skeleton.neighbor + (skeleton.self_loops if with_self else ())
    a = np.zeros((v, v), dtype=np.float32)
    for e in edges:
        a[e] = 1.0
    return a


def k_adjacency(a: np.ndarray, k: int, with_self: bool = False,
                self_factor: float = 1.0) -> np.ndarray:
    """k-hop shell adjacency (reference graph/tools.py:97-106)."""
    identity = np.eye(len(a), dtype=a.dtype)
    if k == 0:
        return identity
    ak = (np.minimum(np.linalg.matrix_power(a + identity, k), 1)
          - np.minimum(np.linalg.matrix_power(a + identity, k - 1), 1))
    if with_self:
        ak = ak + self_factor * identity
    return ak


def build_adjacency(name: str, labeling_mode: str = "spatial") -> np.ndarray:
    """Build the (K, V, V) adjacency stack for a named skeleton.

    `labeling_mode='spatial'` is the only mode shipped by the reference
    (graph/ntu_rgb_d.py:26-29); kept as an argument for config parity.
    """
    if labeling_mode != "spatial":
        raise ValueError(f"Unknown labeling mode {labeling_mode!r}")
    return spatial_graph(get_skeleton(name))


@dataclasses.dataclass(frozen=True)
class EdgeSet:
    """COO edge structure for one adjacency subset, partitionable by edge.

    Arrays are index-sorted by destination joint so a partition is a
    contiguous slice and segment-sum aggregation is monotone.
    """

    src: np.ndarray    # (E,) int32 source joint per edge
    dst: np.ndarray    # (E,) int32 destination joint per edge
    weight: np.ndarray  # (E,) float32 normalized edge weight
    num_joints: int

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])

    def to_dense(self) -> np.ndarray:
        a = np.zeros((self.num_joints, self.num_joints), dtype=np.float32)
        a[self.dst, self.src] = self.weight
        return a

    def partition(self, num_parts: int) -> Tuple["EdgeSet", ...]:
        """Split edges into contiguous near-equal parts (by edge count).

        Used by the multi-host edge-partitioned aggregation: each part owns
        a slice of the edge list; boundary joint features are exchanged via
        collectives (see agcn_tpu/parallel/edge_partition.py).
        """
        bounds = np.linspace(0, self.num_edges, num_parts + 1).astype(int)
        return tuple(
            EdgeSet(self.src[s:e], self.dst[s:e], self.weight[s:e],
                    self.num_joints)
            for s, e in zip(bounds[:-1], bounds[1:])
        )


def dense_to_edges(a: np.ndarray) -> EdgeSet:
    """Convert one dense (V, V) adjacency (A[dst, src]) to COO form."""
    dst, src = np.nonzero(a)
    order = np.lexsort((src, dst))
    return EdgeSet(
        src=src[order].astype(np.int32),
        dst=dst[order].astype(np.int32),
        weight=a[dst, src][order].astype(np.float32),
        num_joints=a.shape[-1],
    )


def spatial_edge_sets(name: str) -> Tuple[EdgeSet, ...]:
    """COO form of each spatial-partition subset."""
    return tuple(dense_to_edges(a) for a in build_adjacency(name))

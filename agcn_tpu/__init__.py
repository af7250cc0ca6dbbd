"""agcn_tpu: a TPU-native skeleton-action-recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the
2s-AGCN research codebase (cheneeheng/2s-AGCN): AGCN / AAGCN / SGN model
families over skeleton graphs, two-stream ensembling, a host-parallel data
pipeline, and a distributed (data- and edge-partitioned) training runtime
designed around `jax.sharding` meshes.
"""

__version__ = "0.1.0"

"""Combinatorial SGN config-space smoke sweep.

Equivalent of the reference's model/resource/tests.py test_sgn6: sweep the
config axes jointly (a deterministic sample of the product space, invalid
combos skipped) and assert the model builds and runs a forward pass.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agcn_tpu.models.sgn import SGN

AXES = {
    "input_position": [0, 1, 2],
    "input_velocity": [0, 1, 11],
    "semantic_joint": [0, 1],
    "semantic_frame": [0, 1],
    "semantic_joint_fusion": [0, 1],
    "semantic_frame_location": [0, 1],
    "sgcn_gt_mode": [0, 1],
    "sgcn_prenorm": [False, True],
    "sgcn_residual": [(0, 0, 0), (1, 1, 1)],
    "gcn_fpn": [-1, 1],
    "t_mode": [0, 1, 2],
    "xem_projection": [0, 1],
    "spatial_maxpool": [1, 3],
    "multi_t": [((), (), (3,)), ((), (), (3, 5))],
}


def _valid(cfg):
    if cfg["input_position"] == 0 and cfg["input_velocity"] == 0:
        return False
    if cfg["input_position"] == 0 and cfg["semantic_joint"] > 0:
        return False  # reference constraint (sgn_v14.py:251-252)
    return True


def _sampled_configs(n=48):
    keys = sorted(AXES)
    space = list(itertools.product(*(AXES[k] for k in keys)))
    rng = np.random.default_rng(7)
    picks = rng.choice(len(space), size=min(n * 3, len(space)),
                       replace=False)
    configs = []
    for p in picks:
        cfg = dict(zip(keys, space[p]))
        if _valid(cfg):
            configs.append(cfg)
        if len(configs) >= n:
            break
    return configs


@pytest.mark.parametrize("cfg", _sampled_configs(),
                         ids=lambda c: ",".join(
                             f"{k[:6]}={v}" for k, v in sorted(c.items())))
def test_sgn_config_space(cfg):
    model = SGN(num_class=5, **cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 75)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = model.apply(variables, x, train=False)
    assert out.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out)))

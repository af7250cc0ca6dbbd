"""All-pairs SGN config-space sweep with forward+backward smoke.

Equivalent of the reference's constraint walk (model/resource/tests.py:5-66),
which enumerates ~10^5 combos: here a greedy pairwise-covering design
guarantees every VALUE PAIR across every axis pair appears in at least one
config (the standard combinatorial-testing argument: nearly all interaction
bugs are pairwise), with constraint-repair for the reference's documented
invalid combos. Each config runs forward AND backward (grad wrt params)
in train mode.
"""

import numpy as np
import pytest

AXES = {
    "input_position": (0, 1, 2),
    "input_velocity": (0, 1, 11),
    "semantic_joint": (0, 1),
    "semantic_frame": (0, 1),
    "semantic_joint_fusion": (0, 1),
    "semantic_frame_location": (0, 1),
    "xem_projection": (0, 1),
    "sgcn_gt_mode": (0, 1, 2, 3, 4, 5, 6),
    "sgcn_attn_mode": (0, 1, 2, 3),
    "sgcn_prenorm": (False, True),
    "sgcn_residual": ((0, 0, 0), (1, 1, 1)),
    "sgcn_ffn": (None, 4.0),
    "gcn_fpn": (-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
    "spatial_maxpool": (0, 1, 3, 4, 5),
    "temporal_maxpool": (1, 2, 3, 4, 5),
    "t_mode": (0, 1, 2, 3, 4, 5),
    "multi_t": (((), (), (3,)), ((), (), (3, 5)), ((3,), (3,), (3,))),
}


def _invalid_pair(a, va, b, vb):
    """Pairs unsatisfiable under the reference's config constraints
    (model/resource/tests.py:31-45, sgn_v14.py:251-252)."""
    d = {a: va, b: vb}
    if d.get("input_position") == 0 and d.get("input_velocity") == 0:
        return True
    if d.get("input_position") == 0 and d.get("semantic_joint", 0) > 0:
        return True
    if d.get("sgcn_gt_mode", 1) in (5, 6) and d.get("t_mode", 1) in (0, 3):
        # the gt5/6 map-head output must match the other branch widths
        # for the output mean; t_mode 0/3 make the widths level-dependent
        # and the reference crashes on the mismatch too
        return True
    if d.get("sgcn_gt_mode", 1) in (5, 6) and d.get("spatial_maxpool", 1) == 0:
        # without spatial pooling the other branches keep V=25 while the
        # map head is V=1 — the reference's tensor_list_mean crashes too
        return True
    if d.get("gcn_fpn", -1) == 0 and d.get("t_mode", 1) == 0:
        # fpn 0 means the per-level GCN features are averaged, but
        # t_mode 0 skips the temporal MLPs that equalize the level
        # widths — the reference crashes at the stack too
        # (sgn_v14.py:997 tensor_list_mean, verified: RuntimeError
        # "stack expects each tensor to be equal size")
        return True
    return False


def _repair(cfg, rng):
    """Make a random config valid without touching axis values that the
    covering design counts (multi_t extension for gt 6 happens at model
    construction)."""
    if cfg["input_position"] == 0 and cfg["input_velocity"] == 0:
        cfg["input_velocity"] = 1
    if cfg["input_position"] == 0 and cfg["semantic_joint"] > 0:
        cfg["semantic_joint"] = 0
    if cfg["sgcn_gt_mode"] in (5, 6) and cfg["t_mode"] in (0, 3):
        cfg["t_mode"] = 1
    if cfg["sgcn_gt_mode"] in (5, 6) and cfg["spatial_maxpool"] == 0:
        cfg["spatial_maxpool"] = 1
    if cfg["gcn_fpn"] == 0 and cfg["t_mode"] == 0:
        cfg["t_mode"] = 1
    return cfg


def _satisfies(cfg):
    if cfg["input_position"] == 0 and cfg["input_velocity"] == 0:
        return False
    if cfg["input_position"] == 0 and cfg["semantic_joint"] > 0:
        return False
    if cfg["sgcn_gt_mode"] in (5, 6) and cfg["t_mode"] in (0, 3):
        return False
    if cfg["sgcn_gt_mode"] in (5, 6) and cfg["spatial_maxpool"] == 0:
        return False
    if cfg["gcn_fpn"] == 0 and cfg["t_mode"] == 0:
        return False
    return True


def _pairs_of(cfg, keys):
    out = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            out.add((a, cfg[a], b, cfg[b]))
    return out


def build_covering(seed=11, candidates=40):
    keys = sorted(AXES)
    uncovered = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            for va in AXES[a]:
                for vb in AXES[b]:
                    if not _invalid_pair(a, va, b, vb):
                        uncovered.add((a, va, b, vb))
    rng = np.random.default_rng(seed)
    configs = []
    while uncovered:
        # min-by-repr: set iteration order depends on PYTHONHASHSEED,
        # which made CONFIGS differ between pytest processes (a failing
        # config could vanish on re-run); repr gives a total, stable
        # order over the mixed-type tuples
        seedpair = min(uncovered, key=repr)
        best_cov, best_cfg = -1, None
        for _ in range(candidates):
            cfg = {k: AXES[k][rng.integers(len(AXES[k]))] for k in keys}
            # anchor an uncovered pair so progress is guaranteed
            cfg[seedpair[0]], cfg[seedpair[2]] = seedpair[1], seedpair[3]
            cfg = _repair(cfg, rng)
            if not _satisfies(cfg):
                continue
            cov = len(_pairs_of(cfg, keys) & uncovered)
            if cov > best_cov:
                best_cov, best_cfg = cov, cfg
        if best_cfg is None:  # anchored pair not repairable: drop it
            uncovered.discard(seedpair)
            continue
        configs.append(best_cfg)
        uncovered -= _pairs_of(best_cfg, keys)
    return configs


CONFIGS = build_covering()
N_GROUPS = 10


def test_covering_properties():
    """The design covers every satisfiable axis-value pair."""
    keys = sorted(AXES)
    covered = set()
    for cfg in CONFIGS:
        assert _satisfies(cfg)
        covered |= _pairs_of(cfg, keys)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            for va in AXES[a]:
                for vb in AXES[b]:
                    if not _invalid_pair(a, va, b, vb):
                        assert (a, va, b, vb) in covered, (a, va, b, vb)


@pytest.mark.parametrize("group", range(N_GROUPS))
def test_sgn_pairwise_fwd_bwd(group):
    import jax
    import jax.numpy as jnp

    from agcn_tpu.models.sgn import SGN

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 75)).astype(np.float32))
    y = jnp.asarray([0, 2])

    for idx in range(group, len(CONFIGS), N_GROUPS):
        cfg = dict(CONFIGS[idx])
        kwargs = dict(cfg)
        if cfg["sgcn_gt_mode"] == 6:
            # gt 6's attention-map feature level needs its own temporal
            # entry (sgn_v14.py:573-576)
            kwargs["multi_t"] = tuple(cfg["multi_t"]) + ((3,),)
        if cfg["t_mode"] == 3:
            kwargs["t_mha_kwargs"] = {"num_layers": 1, "nhead": 2,
                                      "dim_feedforward": 64,
                                      "dropout": 0.0}
        # gt5 head width must equal the temporal width (c4 * 0.25)
        model = SGN(num_class=5, c_multiplier=(0.25, 0.25, 0.25, 0.25),
                    sgcn_gt_out_channels2=128, **kwargs)
        try:
            variables = model.init(jax.random.PRNGKey(0), x, train=False)

            def loss_fn(params):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables.get("batch_stats", {})},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)})
                logits = out[0] if isinstance(out, tuple) else out
                onehot = jax.nn.one_hot(y, 5)
                return -jnp.mean(jnp.sum(
                    jax.nn.log_softmax(logits) * onehot, -1))

            loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
            assert np.isfinite(float(loss)), cfg
            gnorm = sum(float(jnp.sum(jnp.abs(g)))
                        for g in jax.tree_util.tree_leaves(grads))
            assert np.isfinite(gnorm), cfg
        except Exception as e:
            raise AssertionError(f"config #{idx} failed: {cfg}") from e
